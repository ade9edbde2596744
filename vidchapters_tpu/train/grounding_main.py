"""Grounding training orchestrator (moment_detr train.py equivalent).

Epoch loop with AdamW/StepLR, eval every ``eval_every`` epochs, early stop
when MR-full-mAP stops improving for ``early_stop_patience`` epochs
(train.py:155-179), ``best``/``last`` checkpoints (160-208), and a final
inference pass with the best weights (277-288).

Mesh-aware: the reference trains bs 256 on 8 GPUs via nn.DataParallel
(moment_detr/inference.py:207); here batches shard over the mesh data
axis (replicated params, XLA gradient collectives) and each host reads
its own slice of the dataset.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vidchapters_tpu.config import GroundingConfig
from vidchapters_tpu.data.grounding_dataset import GroundingDataset, grounding_collate
from vidchapters_tpu.models.grounding import MomentDETR
from vidchapters_tpu.runtime.checkpoint import CheckpointManager
from vidchapters_tpu.runtime.meters import MetricLogger
from vidchapters_tpu.runtime.rng import fast_train_key
from vidchapters_tpu.train.grounding_train import (
    GroundingTrainState,
    build_grounding_optimizer,
    evaluate_grounding,
    make_grounding_infer,
    make_grounding_train_step,
)


def batches(dataset: GroundingDataset, batch_size: int, max_v_l: int,
            max_spans: int, shuffle: bool, seed: int,
            text_featurizer=None, num_shards: int = 1, shard_index: int = 0,
            speech_featurizer=None, max_q_l: int = 32):
    """Per-host batch iterator: with ``num_shards`` > 1 each process reads
    a strided slice of the (epoch-shuffled) order, replacing the
    reference's DistributedSampler role. ``speech_featurizer`` turns the
    collated ASR strings into static-shape BERT token ids
    (prepare_batch_inputs, start_end_dataset.py:299-306)."""
    order = np.arange(len(dataset))
    rng = np.random.default_rng(seed)
    if shuffle:
        rng.shuffle(order)
    if num_shards > 1:
        order = order[shard_index::num_shards]
    for s in range(0, len(order) - batch_size + 1, batch_size):
        batch = grounding_collate([dataset[int(i)] for i in order[s:s + batch_size]],
                                  max_v_l, max_spans, max_q_l=max_q_l)
        if text_featurizer is not None:
            batch["query_tokens"] = text_featurizer(batch["query"])
        if speech_featurizer is not None and "speech" in batch:
            batch["speech_tokens"] = speech_featurizer(batch["speech"])
        yield batch


def main(train_jsonl: str, val_jsonl: str, v_feat_dirs: List[str],
         cfg: GroundingConfig, save_dir: str,
         text_encoder=None, text_params=None, clip_tokenizer=None,
         n_epochs: int = 50, batch_size: int = 32, lr: float = 1e-4,
         max_spans: int = 5, eval_every: int = 5,
         early_stop_patience: int = 10, seed: int = 0,
         max_train_batches: Optional[int] = None,
         test_jsonl: Optional[str] = None,
         subtitles_path: Optional[str] = None,
         speech_encoder=None, speech_params=None,
         speech_tokenizer=None) -> Dict[str, float]:
    use_speech = cfg.use_speech and speech_encoder is not None
    ds_kw = dict(max_v_l=cfg.max_v_l, clip_len=cfg.clip_length,
                 use_speech=use_speech, subtitles_path=subtitles_path)
    train_ds = GroundingDataset(train_jsonl, v_feat_dirs, train=True, **ds_kw)
    val_ds = GroundingDataset(val_jsonl, v_feat_dirs, train=False, **ds_kw)
    from vidchapters_tpu.utils.io import load_jsonl

    ground_truth = load_jsonl(val_jsonl)

    model = MomentDETR(cfg)
    tokenize = (lambda qs: np.asarray(clip_tokenizer(qs))) if clip_tokenizer else None
    # static-shape BERT ids for the ASR stream (max_speech_l cap,
    # start_end_dataset.py:122)
    sp_tok = ((lambda texts: np.asarray(
        speech_tokenizer(texts, max_length=cfg.speech_max_l)))
        if use_speech and speech_tokenizer is not None else None)

    first = next(batches(train_ds, min(batch_size, len(train_ds)), cfg.max_v_l,
                         max_spans, False, seed, tokenize,
                         speech_featurizer=sp_tok, max_q_l=cfg.max_q_l))
    rng = jax.random.PRNGKey(seed)
    step_key = fast_train_key(seed)
    if text_encoder is not None:
        src_txt = text_encoder.apply({"params": text_params},
                                     jnp.asarray(first["query_tokens"]),
                                     return_tokens=True)
        txt_mask = (jnp.asarray(first["query_tokens"]) != 0).astype(jnp.int32)
    else:
        src_txt = jnp.asarray(first["query_feat"])
        txt_mask = jnp.asarray(first["query_mask"])
    init_speech = init_speech_mask = None
    if use_speech and "speech_tokens" in first:
        toks0 = jnp.asarray(first["speech_tokens"])
        init_speech_mask = (toks0 != 0).astype(jnp.int32)
        init_speech = speech_encoder.apply({"params": speech_params}, toks0,
                                           attention_mask=init_speech_mask)
    params = model.init(rng, src_txt, txt_mask,
                        jnp.asarray(first["video_feat"]),
                        jnp.asarray(first["video_mask"]),
                        src_speech=init_speech,
                        src_speech_mask=init_speech_mask)["params"]

    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    tx = build_grounding_optimizer(lr=lr, steps_per_epoch=steps_per_epoch)
    train_step = jax.jit(make_grounding_train_step(
        model, text_encoder, text_params, tx, cfg,
        speech_encoder=speech_encoder, speech_params=speech_params))
    infer = make_grounding_infer(model, text_encoder, text_params,
                                 speech_encoder=speech_encoder,
                                 speech_params=speech_params)
    state = GroundingTrainState(params, tx.init(params), jnp.array(0))
    ckpt = CheckpointManager(save_dir, best_metric="MR-full-mAP")

    # data-parallel mesh: batches shard over the data axis, params stay
    # replicated and XLA inserts the gradient collectives (the reference's
    # bs-256 8-GPU DataParallel run, inference.py:207, but with real sync)
    from vidchapters_tpu.parallel.sharding import batch_sharding
    from vidchapters_tpu.runtime.mesh import create_mesh

    mesh = create_mesh()
    n_data = mesh.devices.shape[0]
    shard = batch_sharding(mesh) if batch_size % max(n_data, 1) == 0 else None
    n_proc, proc = jax.process_count(), jax.process_index()

    best_epoch = -1
    log_path = Path(save_dir) / "log.txt"
    for epoch in range(n_epochs):
        logger = MetricLogger()
        pending = None  # one-step-delayed fetch overlaps host batch prep
        for bi, batch in enumerate(batches(train_ds, batch_size, cfg.max_v_l,
                                           max_spans, True, seed + epoch,
                                           tokenize, num_shards=n_proc,
                                           shard_index=proc,
                                           speech_featurizer=sp_tok,
                                           max_q_l=cfg.max_q_l)):
            if max_train_batches and bi >= max_train_batches:
                break
            arrays = {k: (jax.device_put(v, shard) if shard is not None
                          else jnp.asarray(v))
                      for k, v in batch.items() if isinstance(v, np.ndarray)}
            with mesh:
                state, metrics = train_step(state, arrays, step_key)
            if pending is not None:  # one-step-delayed fetch (overlap)
                logger.update(loss=float(pending["total"]))
            pending = metrics
        if pending is not None:
            logger.update(loss=float(pending["total"]))
        stats = {"epoch": epoch, **logger.global_averages()}

        if (epoch + 1) % eval_every == 0 or epoch == n_epochs - 1:
            _, metrics = evaluate_grounding(
                infer, state.params,
                batches(val_ds, min(batch_size, len(val_ds)), cfg.max_v_l,
                        max_spans, False, 0, tokenize,
                        speech_featurizer=sp_tok, max_q_l=cfg.max_q_l),
                ground_truth, tokenizer=None if tokenize is None else clip_tokenizer)
            stats.update(metrics["brief"])
            if ckpt.maybe_save_best((state.params,), epoch, metrics["brief"]):
                best_epoch = epoch
            elif early_stop_patience > 0 and epoch - best_epoch >= early_stop_patience:
                print(f"early stop at epoch {epoch} (best {best_epoch})")
                ckpt.save_last((state.params,), epoch)
                break
        ckpt.save_last((state.params,), epoch)
        with open(log_path, "a") as f:
            f.write(json.dumps(stats) + "\n")

    if ckpt.has("best"):
        (params,) = ckpt.restore("best", (state.params,))
    else:
        params = state.params
    _, final_metrics = evaluate_grounding(
        infer, params,
        batches(val_ds, min(batch_size, len(val_ds)), cfg.max_v_l, max_spans,
                False, 0, tokenize,
                speech_featurizer=sp_tok, max_q_l=cfg.max_q_l),
        ground_truth, tokenizer=None if tokenize is None else clip_tokenizer)
    results = dict(final_metrics["brief"])

    # held-out test split with the best weights (DatasetPaths.test_jsonl_path;
    # reference runs a final inference pass on the eval split with the best
    # checkpoint, train.py:277-288) — predictions persist, metrics only when
    # the split carries GT windows
    if test_jsonl:
        test_ds = GroundingDataset(test_jsonl, v_feat_dirs, train=False,
                                   **ds_kw)
        test_gt = load_jsonl(test_jsonl)
        submission, test_metrics = evaluate_grounding(
            infer, params,
            batches(test_ds, min(batch_size, len(test_ds)), cfg.max_v_l,
                    max_spans, False, 0, tokenize,
                    speech_featurizer=sp_tok, max_q_l=cfg.max_q_l),
            test_gt, tokenizer=None if tokenize is None else clip_tokenizer)
        with open(Path(save_dir) / "test_preds.jsonl", "w") as f:
            for row in submission:
                f.write(json.dumps(row) + "\n")
        if any("relevant_windows" in g for g in test_gt):
            results.update({f"test_{k}": v
                            for k, v in test_metrics["brief"].items()})
    return results


if __name__ == "__main__":  # moment_detr train.py CLI equivalent
    import argparse

    from vidchapters_tpu.config import load_config

    p = argparse.ArgumentParser(description="Chapter-grounding (Moment-DETR) training")
    p.add_argument("--recipe", default=None,
                   help="recipe json with model/train/data sections "
                        "(e.g. configs/chapters_momentdetr.json); explicit "
                        "flags override its values")
    p.add_argument("--train-jsonl", default=None)
    p.add_argument("--val-jsonl", default=None)
    p.add_argument("--test-jsonl", default=None,
                   help="held-out split: final inference with best weights "
                        "-> save_dir/test_preds.jsonl (+ metrics if it has "
                        "relevant_windows)")
    p.add_argument("--v-feat-dirs", nargs="+", default=None)
    p.add_argument("--subtitles-path", default=None,
                   help="ASR pickle/dir for the speech stream "
                        "(model.use_speech recipes)")
    p.add_argument("--bert-ckpt", default=None,
                   help="local HF bert-base-uncased dir for the frozen "
                        "speech tower + its WordPiece tokenizer; omitted = "
                        "random 1-layer tower + hash tokenizer (smoke only)")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--config", default=None, help="GroundingConfig json (defaults used if omitted)")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-spans", type=int, default=5)
    p.add_argument("--eval-every", type=int, default=5)
    p.add_argument("--early-stop-patience", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--clip-text-ckpt", default=None,
                   help="OpenAI CLIP .pt for the frozen text tower; omitted "
                        "= randomly initialised tower (smoke/debug only)")
    # recipe defaults are applied before re-parsing so explicit flags win
    pre, _ = p.parse_known_args()
    recipe = {}
    if pre.recipe:
        with open(pre.recipe) as f:
            recipe = json.load(f)
        tr = recipe.get("train", {})
        da = recipe.get("data", {})
        p.set_defaults(
            epochs=tr.get("epochs", 50), batch_size=tr.get("batch_size", 32),
            lr=tr.get("lr", 1e-4), max_spans=tr.get("max_spans", 5),
            eval_every=tr.get("eval_every", 5),
            early_stop_patience=tr.get("early_stop_patience", 10),
            train_jsonl=da.get("train_jsonl"), val_jsonl=da.get("val_jsonl"),
            test_jsonl=da.get("test_jsonl"),
            subtitles_path=da.get("subtitles_path"),
            v_feat_dirs=da.get("v_feat_dirs"))
    a = p.parse_args()
    # canonical per-dataset path record (config.DatasetPaths; the moment-
    # retrieval jsonl fields exist for exactly this task)
    from vidchapters_tpu.config import DatasetPaths

    ds_paths = DatasetPaths(train_jsonl_path=a.train_jsonl or "",
                            val_jsonl_path=a.val_jsonl or "",
                            test_jsonl_path=a.test_jsonl or "",
                            subtitles_path=a.subtitles_path or "")
    for req in ("train_jsonl", "val_jsonl", "v_feat_dirs"):
        if getattr(a, req) is None:
            p.error(f"--{req.replace('_', '-')} required (flag or recipe)")
    if recipe.get("model"):
        import dataclasses

        cfg = dataclasses.replace(GroundingConfig(), **recipe["model"])
    else:
        cfg = load_config(GroundingConfig, a.config) if a.config else GroundingConfig()

    # frozen CLIP text tower (moment_detr uses ViT-L/14 token features)
    from vidchapters_tpu.data.clip_tokenizer import CLIPTokenizer
    from vidchapters_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder

    tcfg = CLIPTextConfig(width=cfg.t_feat_dim, output_dim=cfg.t_feat_dim,
                          heads=max(cfg.t_feat_dim // 64, 1),
                          layers=12 if a.clip_text_ckpt else 1)
    text_encoder = CLIPTextEncoder(tcfg)
    tokenizer = CLIPTokenizer()
    if a.clip_text_ckpt:
        import torch

        from vidchapters_tpu.models.clip import convert_openai_clip_text

        sd = torch.load(a.clip_text_ckpt, map_location="cpu")
        sd = sd.state_dict() if hasattr(sd, "state_dict") else sd
        text_params = convert_openai_clip_text(
            {k: v.numpy() for k, v in sd.items()})
    else:
        print("WARNING: no --clip-text-ckpt; random text tower (smoke mode)")
        toks = jnp.asarray(tokenizer(["init"]))
        text_params = text_encoder.init(jax.random.PRNGKey(0), toks)["params"]

    # frozen BERT speech tower (the reference's in-model bert + bert_proj,
    # model.py:47-50 / 131-136), only when the recipe enables speech
    speech_encoder = speech_params = speech_tokenizer = None
    if cfg.use_speech:
        from vidchapters_tpu.models.bert import BertConfig, BertModel

        if a.bert_ckpt:
            import torch
            from transformers import BertTokenizer

            from vidchapters_tpu.models.bert import convert_hf_bert

            hf_tok = BertTokenizer.from_pretrained(a.bert_ckpt)

            def speech_tokenizer(texts, max_length=512):
                enc = hf_tok(texts, max_length=max_length, truncation=True,
                             padding="max_length", return_tensors="np")
                return enc["input_ids"].astype(np.int32)

            import transformers

            hf = transformers.BertModel.from_pretrained(a.bert_ckpt)
            speech_params = convert_hf_bert(
                {k: v.numpy() for k, v in hf.state_dict().items()})
            speech_encoder = BertModel(BertConfig(
                hidden_size=cfg.s_feat_dim,
                num_layers=hf.config.num_hidden_layers))
        else:
            print("WARNING: no --bert-ckpt; random speech tower + hash "
                  "tokenizer (smoke mode)")
            bcfg = BertConfig(hidden_size=cfg.s_feat_dim, num_layers=1,
                              num_heads=next(h for h in (12, 8, 4, 2, 1)
                                             if cfg.s_feat_dim % h == 0))
            speech_encoder = BertModel(bcfg)

            def speech_tokenizer(texts, max_length=512,
                                 _vocab=bcfg.vocab_size):
                out = np.zeros((len(texts), max_length), np.int32)
                for i, t in enumerate(texts):
                    words = t.split()[: max_length]
                    out[i, : len(words)] = [
                        hash(w) % (_vocab - 1) + 1 for w in words]
                return out

            speech_params = speech_encoder.init(
                jax.random.PRNGKey(1),
                speech_tokenizer(["init"], max_length=8))["params"]

    print(json.dumps(main(ds_paths.train_jsonl_path, ds_paths.val_jsonl_path,
                          a.v_feat_dirs, cfg,
                          a.save_dir, text_encoder=text_encoder,
                          text_params=text_params, clip_tokenizer=tokenizer,
                          n_epochs=a.epochs,
                          batch_size=a.batch_size, lr=a.lr,
                          max_spans=a.max_spans, eval_every=a.eval_every,
                          early_stop_patience=a.early_stop_patience,
                          seed=a.seed,
                          test_jsonl=ds_paths.test_jsonl_path or None,
                          subtitles_path=ds_paths.subtitles_path or None,
                          speech_encoder=speech_encoder,
                          speech_params=speech_params,
                          speech_tokenizer=speech_tokenizer)))
