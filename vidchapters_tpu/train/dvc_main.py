"""DVC / chapter-generation training entry point (the dvc.py equivalent).

Full orchestration matching dvc.py:243-475: build tokenizer + datasets +
model + optimizer, run per-epoch train/eval with best-checkpoint selection on
CIDEr (dvc.py:402-418), persist ``last`` for resume, write per-epoch
``log.txt`` JSON lines (dvc.py:429-431) and prediction jsons, and reload the
best checkpoint for the final test eval (dvc.py:447-464).

Unlike the reference's launcher-spawned unsynchronized replicas, there is one
process per host, batches shard over the mesh data axis, and XLA keeps
parameters in sync.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vidchapters_tpu.config import ExperimentConfig
from vidchapters_tpu.data.dvc_dataset import (
    DenseVideoCaptioningDataset,
    EpochIterator,
    YTPretrainDataset,
)
from vidchapters_tpu.data.tokenizer import build_tokenizer
from vidchapters_tpu.models.vid2seq import Vid2Seq
from vidchapters_tpu.runtime.checkpoint import CheckpointManager
from vidchapters_tpu.runtime.mesh import create_mesh, is_main_process
from vidchapters_tpu.runtime.meters import MetricLogger
from vidchapters_tpu.runtime.rng import fast_train_key
from vidchapters_tpu.train.dvc_train import (
    TrainState,
    evaluate,
    make_train_step,
)
from vidchapters_tpu.train.schedules import build_optimizer


def build_datasets(cfg: ExperimentConfig, tokenizer):
    from vidchapters_tpu.config import default_dataset_paths

    train_sets, val_sets, test_sets = [], [], []
    for name in cfg.combine_datasets:
        # explicit per-dataset paths win; otherwise derive the reference's
        # standard layout from the configured roots (args.py:34-103)
        paths = cfg.datasets.get(name) or default_dataset_paths(cfg.paths, name)
        if name == "htm":
            train_sets.append((name, YTPretrainDataset.from_csv(
                paths.train_json_path, paths.features_path, tokenizer,
                paths.subtitles_path, cfg.data)))
            continue
        train_sets.append((name, DenseVideoCaptioningDataset(
            paths.train_json_path, paths.features_path, tokenizer, cfg.data,
            subtitles_path=paths.subtitles_path)))
        val_sets.append((name, DenseVideoCaptioningDataset(
            paths.val_json_path, paths.features_path, tokenizer, cfg.data,
            subtitles_path=paths.subtitles_path), paths.val_json_path))
        if getattr(paths, "test_json_path", None):
            test_sets.append((name, DenseVideoCaptioningDataset(
                paths.test_json_path, paths.features_path, tokenizer,
                cfg.data, subtitles_path=paths.subtitles_path),
                paths.test_json_path))
    return train_sets, val_sets, test_sets


def main(cfg: ExperimentConfig,
         init_params: Optional[Dict] = None,
         load: str = "", eval_only: bool = False) -> Dict[str, float]:
    """``load``: initialize parameters from a reference ``.pth`` (via
    models.torch_import, incl. the released-checkpoint vocab surgery) or an
    orbax ``best``/``last`` dir (dvc.py:354-363 --load). ``eval_only``
    skips training and runs the final test/val eval with the loaded or
    best weights (dvc.py:308,364 --eval)."""
    # tokenizer: explicit path, else the presave root's t5-base sentencepiece
    # (the reference resolves HF assets under PRESAVE_DIR, args.py:185)
    tok_path = cfg.tokenizer_path
    if not tok_path and cfg.paths.presave_dir:
        cand = Path(cfg.paths.presave_dir) / "t5-base" / "spiece.model"
        tok_path = str(cand) if cand.exists() else ""
    tokenizer = build_tokenizer(tok_path, num_bins=cfg.model.num_bins)
    mesh = create_mesh(cfg.train.mesh)
    train_sets, val_sets, test_sets = build_datasets(cfg, tokenizer)

    model = Vid2Seq(cfg.model)
    rng = jax.random.PRNGKey(cfg.train.seed)
    step_key = fast_train_key(cfg.train.seed)  # rbg dropout stream (runtime/rng.py)

    # init (or import) parameters
    d = cfg.data
    dummy_video = jnp.zeros((1, d.max_feats, d.features_dim), jnp.float32)
    dummy_inp = jnp.ones((1, 8), jnp.int32)
    dummy_out = jnp.ones((1, 8), jnp.int32)
    if init_params is None and load and not Path(load).is_dir():
        # reference .pth checkpoint (released weights path)
        from vidchapters_tpu.models.torch_import import (
            apply_param_layouts,
            convert_vid2seq_state_dict,
            load_torch_checkpoint,
        )

        print(f"loading torch checkpoint from {load}")
        init_params = apply_param_layouts(convert_vid2seq_state_dict(
            load_torch_checkpoint(load), gated=cfg.model.t5.is_gated_act),
            cfg.model)
    if init_params is None:
        init_params = model.init(
            {"params": rng, "dropout": rng}, dummy_video, dummy_inp,
            jnp.ones_like(dummy_inp), dummy_out)["params"]
        if load:  # orbax dir: params-only restore into the init template
            from vidchapters_tpu.runtime.checkpoint import (
                CheckpointManager as _CM,
            )

            print(f"loading orbax checkpoint from {load}")
            ldir = Path(load)
            init_params = _CM(str(ldir.parent)).restore_params(
                ldir.name, init_params)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(init_params))
    print(f"number of params: {n_params}")  # dvc.py:339-341

    # data-parallel iterators: each host reads its shard
    steps_per_epoch = sum(
        len(EpochIterator(ds, cfg.train.batch_size, d,
                          num_shards=jax.process_count(),
                          shard_index=jax.process_index()))
        for _, ds in train_sets)
    tx = build_optimizer(cfg.train.optim, steps_per_epoch * cfg.train.epochs)
    train_step = jax.jit(make_train_step(
        model, tx, generative=cfg.train.generative,
        denoising=cfg.train.denoising, genasr=cfg.train.genasr),
        donate_argnums=(0,))

    state = TrainState(init_params, tx.init(init_params), jnp.array(0))
    ckpt = CheckpointManager(cfg.train.checkpoint.save_dir or "/tmp/vidchapters_ckpt",
                             best_metric=cfg.train.checkpoint.best_metric,
                             best_mode=cfg.train.checkpoint.best_mode,
                             save_every_epochs=cfg.train.checkpoint.save_every_epochs,
                             keep_last=cfg.train.checkpoint.keep_last,
                             keep_best=cfg.train.checkpoint.keep_best)
    if ckpt.has("last") and not load:  # resume (dvc.py:354-361)
        state = TrainState(*ckpt.restore("last", tuple(state)))
        print(f"resumed from epoch {ckpt.meta('last').get('epoch')}")

    log_path = Path(ckpt.dir) / "log.txt"
    start_epoch = int(ckpt.meta("last").get("epoch", -1)) + 1
    for epoch in range(start_epoch,
                       start_epoch if eval_only else cfg.train.epochs):
        logger = MetricLogger()
        for name, ds in train_sets:
            it = EpochIterator(ds, cfg.train.batch_size, d,
                               seed=cfg.train.seed,
                               num_shards=jax.process_count(),
                               shard_index=jax.process_index())
            it.set_epoch(epoch)
            from vidchapters_tpu.parallel.sharding import host_local_to_global

            # per-host batches assemble into one global batch-sharded array
            # (multi-host: make_array_from_process_local_data; the local
            # batch must tile over this host's slice of the data axis)
            n_local_data = mesh.devices.shape[0] // jax.process_count()
            use_shard = cfg.train.batch_size % max(n_local_data, 1) == 0

            def _drain(pending_metrics):
                """Materialize a finished step's metrics (the NaN hard-stop,
                dvc.py:107-110, fires one step late)."""
                vals = {k: float(v) for k, v in pending_metrics.items()}
                logger.update(**vals)
                if not np.isfinite(vals["total_loss"]):
                    raise RuntimeError("Loss is not finite, stopping training")

            # one-step-delayed metric fetch: the scalar materialization of
            # step i-1 happens after step i is dispatched, so host-side
            # batch prep + the per-call RPC floor overlap device compute
            # instead of serializing with it (CLAUDE.md platform notes)
            pending = None
            for step_i, batch in enumerate(logger.log_every(
                    it, cfg.train.print_freq, f"Epoch [{epoch}] {name}")):
                prof = cfg.train.profile_dir
                if prof and epoch == 0 and step_i == cfg.train.profile_start:
                    jax.profiler.start_trace(prof)
                arrays = {k: (host_local_to_global(v, mesh) if use_shard
                              else jnp.asarray(v))
                          for k, v in batch.items()
                          if isinstance(v, np.ndarray)}
                state, metrics = train_step(state, arrays, step_key)
                if pending is not None:
                    _drain(pending)
                pending = metrics
                if (prof and epoch == 0 and step_i
                        == cfg.train.profile_start + cfg.train.profile_steps):
                    jax.profiler.stop_trace()
                    print(f"profile written to {prof}")
            if pending is not None:
                _drain(pending)

        epoch_stats = {f"train_{k}": v for k, v in logger.global_averages().items()}

        if (epoch + 1) % cfg.train.eval_every_epochs == 0:
            for name, ds, ref_path in val_sets:
                it = EpochIterator(ds, cfg.train.eval_batch_size, d,
                                   shuffle=False, drop_last=False,
                                   num_shards=jax.process_count(),
                                   shard_index=jax.process_index(),
                                   bucket_inputs=True)
                preds, metrics = evaluate(model, state.params, it, tokenizer,
                                          cfg.generation, cfg.model.num_bins,
                                          references=[ref_path])
                epoch_stats.update({f"{name}_{k}": v for k, v in metrics.items()})
                if is_main_process():
                    pred_path = Path(ckpt.dir) / f"{name}_val_preds_e{epoch}.json"
                    with open(pred_path, "w") as f:
                        json.dump({"results": preds}, f)
                ckpt.maybe_save_best(tuple(state), epoch, metrics)

        last_every = max(1, cfg.train.checkpoint.save_last_every_epochs)
        if (epoch + 1) % last_every == 0 or epoch == cfg.train.epochs - 1:
            ckpt.save_last(tuple(state), epoch)
        if is_main_process():
            with open(log_path, "a") as f:
                f.write(json.dumps({"epoch": epoch, **epoch_stats}) + "\n")

    # final eval with the best checkpoint — on the held-out TEST split when
    # one is configured, like the reference (dvc.py:447-464); val otherwise.
    # With --load the explicitly loaded weights are what gets evaluated.
    final_metrics: Dict[str, float] = {}
    if ckpt.has("best") and not load:
        state = TrainState(*ckpt.restore("best", tuple(state)))
    for name, ds, ref_path in (test_sets or val_sets):
        it = EpochIterator(ds, cfg.train.eval_batch_size, d, shuffle=False,
                           drop_last=False, bucket_inputs=True)
        _, metrics = evaluate(model, state.params, it, tokenizer,
                              cfg.generation, cfg.model.num_bins,
                              references=[ref_path])
        final_metrics.update({f"{name}_{k}": v for k, v in metrics.items()})
    return final_metrics


if __name__ == "__main__":
    import argparse

    from vidchapters_tpu.config import load_config
    from vidchapters_tpu.runtime.mesh import maybe_initialize_distributed

    # multi-host rendezvous before any backend use (env-driven:
    # VIDCHAPTERS_NUM_PROCESSES / _PROCESS_ID / _COORDINATOR)
    maybe_initialize_distributed()
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True, help="experiment json")
    p.add_argument("--load", default="",
                   help="initialize from a reference .pth (torch_import, "
                        "incl. released-checkpoint vocab surgery) or an "
                        "orbax best/last dir (dvc.py --load)")
    p.add_argument("--eval", action="store_true",
                   help="skip training; evaluate the loaded/best weights "
                        "on the test (or val) split (dvc.py --eval)")
    a = p.parse_args()
    cfg = load_config(ExperimentConfig, a.config)
    print(main(cfg, load=a.load, eval_only=a.eval))
