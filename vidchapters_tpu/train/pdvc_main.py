"""PDVC training orchestrator (PDVC/train.py equivalent).

Epoch loop with the PDVC recipe (Adam, StepLR decay every
``lr_drop_epochs``), scheduled-sampling probability ramp
(PDVC/train.py:193-197: +0.05 every 5 epochs after epoch 20, capped 0.25),
eval each epoch, best checkpoint on METEOR + SODA (train.py:286-289), and
``info.json`` carrying options + metric histories for exact resume
(train.py:43-60,264-347).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vidchapters_tpu.config import PDVCConfig, to_dict
from vidchapters_tpu.data.pdvc_dataset import PDVCDataset, Translator, pdvc_collate
from vidchapters_tpu.models.pdvc import PDVC
from vidchapters_tpu.runtime.checkpoint import CheckpointManager
from vidchapters_tpu.runtime.meters import MetricLogger
from vidchapters_tpu.runtime.rng import fast_train_key
from vidchapters_tpu.train.pdvc_train import (
    PDVCTrainState,
    build_pdvc_optimizer,
    evaluate_pdvc,
    make_pdvc_infer,
    make_pdvc_train_step,
)


def scheduled_sampling_prob(epoch: int, start: int = 20, inc_every: int = 5,
                            inc: float = 0.05, max_prob: float = 0.25) -> float:
    """PDVC/train.py:193-197 ramp."""
    if epoch < start:
        return 0.0
    return min(inc * ((epoch - start) // inc_every + 1), max_prob)


def transfer_params(src: dict, tgt: dict, verbose: bool = True) -> dict:
    """Cross-dataset checkpoint surgery (PDVC/train.py:100-125): copy every
    leaf whose shape matches; keep the target's fresh init where query
    count / caption vocab / count-head sizes differ."""
    import jax

    flat_src = dict(jax.tree_util.tree_flatten_with_path(src)[0])
    out = []
    skipped = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tgt)[0]:
        s = flat_src.get(path)
        if s is not None and np.shape(s) == np.shape(leaf):
            out.append(s)
        else:
            out.append(leaf)
            skipped.append("/".join(str(p) for p in path))
    if verbose and skipped:
        print(f"transfer_params: kept fresh init for {len(skipped)} leaves "
              f"(e.g. {skipped[:3]})")
    structure = jax.tree_util.tree_structure(tgt)
    return jax.tree_util.tree_unflatten(structure, out)


def main(train_json: str, val_json: str, features_path, cfg: PDVCConfig,
         save_dir: str, translator: Optional[Translator] = None,
         n_epochs: int = 5, batch_size: int = 2, lr: float = 1e-4,
         lr_drop_epochs: int = 8, max_events: int = 10, seed: int = 0,
         self_iou: bool = False) -> Dict[str, float]:
    from vidchapters_tpu.utils.io import load_json

    if translator is None:
        train_data = load_json(train_json)
        translator = Translator.build(
            [s for a in train_data.values() for s in a["sentences"]])
        # vocab size must match the configured caption head
        assert len(translator) <= cfg.vocab_size, \
            (len(translator), cfg.vocab_size)
    train_ds = PDVCDataset(train_json, features_path, translator, cfg,
                           max_events=max_events)
    val_ds = PDVCDataset(val_json, features_path, translator, cfg,
                         max_events=max_events)

    model = PDVC(cfg)
    first = pdvc_collate([train_ds[0]])
    rng = jax.random.PRNGKey(seed)
    step_key = fast_train_key(seed)
    params = model.init({"params": rng}, jnp.asarray(first["video"]),
                        jnp.asarray(first["video_mask"]),
                        method=model.init_all)["params"]
    # persist the caption vocab (the reference's dict_file role) so
    # eval_main can rebuild the exact word<->id mapping standalone
    Path(save_dir).mkdir(parents=True, exist_ok=True)
    translator.to_json(Path(save_dir) / "translator.json")

    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    tx = build_pdvc_optimizer(lr=lr, lr_drop_step=lr_drop_epochs,
                              steps_per_epoch=steps_per_epoch)
    train_step = jax.jit(make_pdvc_train_step(model, tx, cfg,
                                              self_iou=self_iou))
    infer = make_pdvc_infer(model, cfg)
    state = PDVCTrainState(params, tx.init(params), jnp.array(0))
    ckpt = CheckpointManager(save_dir, best_metric="meteor_soda")

    info_path = Path(save_dir) / "info.json"
    histories: List[dict] = []
    start_epoch = 0
    if ckpt.has("last"):  # info.json-style exact resume (PDVC/train.py:46-60)
        state = PDVCTrainState(*ckpt.restore("last", tuple(state)))
        start_epoch = int(ckpt.meta("last").get("epoch", -1)) + 1
        if info_path.exists():
            histories = json.loads(info_path.read_text()).get("histories", [])
        print(f"resumed PDVC training at epoch {start_epoch}")
    np_rng = np.random.default_rng(seed)
    for epoch in range(start_epoch, n_epochs):
        logger = MetricLogger()
        order = np_rng.permutation(len(train_ds))
        pending = None  # one-step-delayed fetch overlaps host batch prep
        for s in range(0, len(order) - batch_size + 1, batch_size):
            batch = pdvc_collate([train_ds[int(i)] for i in order[s:s + batch_size]])
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if isinstance(v, np.ndarray)}
            state, metrics = train_step(state, arrays, step_key)
            if pending is not None:
                logger.update(loss=float(pending["total"]))
            pending = metrics
        if pending is not None:
            logger.update(loss=float(pending["total"]))

        def val_batches():
            for s in range(0, len(val_ds), batch_size):
                yield pdvc_collate([val_ds[i] for i in
                                    range(s, min(s + batch_size, len(val_ds)))])

        _, metrics = evaluate_pdvc(infer, state.params, val_batches(),
                                   translator, references=[val_json])
        # model-best on METEOR + SODA (PDVC/train.py:286-289)
        metrics["meteor_soda"] = (metrics.get("METEOR", 0.0)
                                  + metrics.get("soda_c", 0.0))
        stats = {"epoch": epoch, **logger.global_averages(), **metrics}
        histories.append(stats)
        ckpt.maybe_save_best((state.params,), epoch, metrics)
        ckpt.save_last((state.params,), epoch)
        info_path.write_text(json.dumps({
            "opt": to_dict(cfg), "histories": histories}, indent=1))

    if ckpt.has("best"):
        (best_params,) = ckpt.restore("best", (state.params,))
    else:
        best_params = state.params

    def val_batches():
        for s in range(0, len(val_ds), batch_size):
            yield pdvc_collate([val_ds[i] for i in
                                range(s, min(s + batch_size, len(val_ds)))])

    _, final_metrics = evaluate_pdvc(infer, best_params, val_batches(),
                                     translator, references=[val_json])
    return final_metrics


def fake_test_caption_file(meta_csv: str, out_path: str) -> str:
    """Unlabeled-video smoke GT (PDVC/eval.py:28-35
    ``create_fake_test_caption_file``): one dummy [0, 0.5] "None" event per
    video from a metadata CSV with ``filename`` / ``video-duration``
    columns, so a checkpoint can run proposal+caption inference on videos
    that have no annotations."""
    import csv
    import os

    out = {}
    with open(meta_csv, newline="") as f:
        for row in csv.DictReader(f):
            vid = os.path.basename(row["filename"]).split(".")[0]
            out[vid] = {"duration": float(row["video-duration"]),
                        "timestamps": [[0, 0.5]], "sentences": ["None"]}
    Path(out_path).write_text(json.dumps(out))
    return out_path


def eval_main(load_dir: str, eval_json: str, features_path, cfg: PDVCConfig,
              save_dir: Optional[str] = None, batch_size: int = 2,
              max_events: int = 10,
              translator: Optional[Translator] = None,
              test_mode: bool = False, alpha: float = 0.3,
              which: str = "best") -> Dict[str, float]:
    """Standalone checkpoint evaluation (PDVC/eval.py:37-117): restore the
    saved params, run inference + reranking over ``eval_json``, write the
    submission json, and score it — unless ``test_mode`` (unlabeled videos
    against a fake single-event GT, eval.py:93-97 ``skip_lang_eval``)."""
    from vidchapters_tpu.runtime.checkpoint import CheckpointManager

    load_path = Path(load_dir)
    if translator is None:
        tpath = load_path / "translator.json"
        if not tpath.exists():
            raise FileNotFoundError(
                f"{tpath} not found — training now writes it; pass "
                "translator= explicitly for older checkpoints")
        translator = Translator.from_json(tpath)
    val_ds = PDVCDataset(eval_json, features_path, translator, cfg,
                         max_events=max_events)

    model = PDVC(cfg)
    first = pdvc_collate([val_ds[0]])
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(first["video"]),
                        jnp.asarray(first["video_mask"]),
                        method=model.init_all)["params"]
    ckpt = CheckpointManager(str(load_path))
    name = which if ckpt.has(which) else "last"
    if not ckpt.has(name):
        raise FileNotFoundError(f"no '{which}' or 'last' checkpoint "
                                f"in {load_dir}")
    (params,) = ckpt.restore(name, (params,))
    epoch = int(ckpt.meta(name).get("epoch", -1))
    print(f"loaded PDVC '{name}' checkpoint (epoch {epoch}) "
          f"from {load_dir}")

    infer = make_pdvc_infer(model, cfg)

    def val_batches():
        for s in range(0, len(val_ds), batch_size):
            yield pdvc_collate([val_ds[i] for i in
                                range(s, min(s + batch_size, len(val_ds)))])

    results, metrics = evaluate_pdvc(
        infer, params, val_batches(), translator, alpha=alpha,
        references=None if test_mode else [eval_json])
    out_dir = Path(save_dir or load_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_name = ("dvc_results.json" if test_mode
                else f"eval_epoch{epoch}_num{len(val_ds)}_alpha{alpha}.json")
    (out_dir / out_name).write_text(json.dumps({"results": results}))
    print(f"saved results json to {out_dir / out_name}")
    return metrics


if __name__ == "__main__":  # PDVC train.py CLI equivalent
    import argparse
    import json as _json

    from vidchapters_tpu.config import PDVCConfig, load_config

    p = argparse.ArgumentParser(description="PDVC dense-captioning training")
    p.add_argument("--recipe", default=None,
                   help="recipe json with model/train/data sections "
                        "(e.g. configs/chapters_pdvc.json); explicit flags "
                        "override its values")
    p.add_argument("--train-json", default=None)
    p.add_argument("--val-json", default=None)
    p.add_argument("--features-path", default=None)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--config", default=None, help="PDVCConfig json (defaults used if omitted)")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=2)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr-drop-epochs", type=int, default=8)
    p.add_argument("--max-events", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval", action="store_true",
                   help="standalone checkpoint evaluation (PDVC/eval.py): "
                        "no training, score --val-json with the checkpoint "
                        "in --load")
    p.add_argument("--load", default=None,
                   help="checkpoint dir for --eval (a --save-dir from "
                        "training; restores 'best', falling back to 'last')")
    p.add_argument("--test-meta-csv", default=None,
                   help="eval_mode=test (PDVC/eval.py:28-35): run inference "
                        "on unlabeled videos listed in this metadata CSV "
                        "(filename / video-duration columns) against a fake "
                        "single-event GT; skips metric scoring")
    pre, _ = p.parse_known_args()
    recipe = {}
    if pre.recipe:
        with open(pre.recipe) as f:
            recipe = _json.load(f)
        tr = recipe.get("train", {})
        da = recipe.get("data", {})
        p.set_defaults(
            epochs=tr.get("epochs", 5), batch_size=tr.get("batch_size", 2),
            lr=tr.get("lr", 1e-4),
            lr_drop_epochs=tr.get("lr_drop_epochs", 8),
            max_events=tr.get("max_events", 10),
            train_json=da.get("train_json"), val_json=da.get("val_json"),
            features_path=da.get("features_path"))
    a = p.parse_args()
    required = (("val_json", "features_path") if a.eval and not a.test_meta_csv
                else ("features_path",) if a.eval
                else ("train_json", "val_json", "features_path"))
    for req in required:
        if getattr(a, req) is None:
            p.error(f"--{req.replace('_', '-')} required (flag or recipe)")
    if recipe.get("model"):
        import dataclasses

        cfg = dataclasses.replace(PDVCConfig(), **recipe["model"])
    else:
        cfg = load_config(PDVCConfig, a.config) if a.config else PDVCConfig()
    if a.eval:
        if not a.load:
            p.error("--eval requires --load <checkpoint dir>")
        eval_json = a.val_json
        if a.test_meta_csv:
            Path(a.save_dir).mkdir(parents=True, exist_ok=True)
            eval_json = fake_test_caption_file(
                a.test_meta_csv, str(Path(a.save_dir) / ".fake_test.json"))
        print(_json.dumps(eval_main(
            a.load, eval_json, a.features_path, cfg, save_dir=a.save_dir,
            batch_size=a.batch_size, max_events=a.max_events,
            test_mode=bool(a.test_meta_csv))))
    else:
        print(_json.dumps(main(a.train_json, a.val_json, a.features_path, cfg,
                               a.save_dir, n_epochs=a.epochs,
                               batch_size=a.batch_size, lr=a.lr,
                               lr_drop_epochs=a.lr_drop_epochs,
                               max_events=a.max_events, seed=a.seed)))
