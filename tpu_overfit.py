"""On-hardware trainability proof: overfit the FULL recipe-scale Vid2Seq
(t5-base + 12-layer temporal ViT, batch 8, 100 feats, ASR<=1000, out 256 —
the exact bench.py shapes) on a tiny synthetic chapter dataset through the
real ``train.dvc_main`` orchestration, then evaluate with the production
beam-4 decode + the full eval stack (tIoU captioning metrics + SODA).

Why this exists: the README-metric reproduction (BASELINE.md) is blocked on
released weights/datasets, which this environment cannot fetch (zero
egress). This is the closest achievable hardware evidence: the same train
step bench.py times must actually LEARN on the chip, the decode must emit
the memorized time tokens + captions, and the metric stack must score them
— end to end, one command, real scale.

Expected outcome on a working stack: the generative loss falls to the
label-smoothing floor (~1.36 nats at eps=0.1 over the 32k vocab — a
"10x total-loss drop" is mathematically impossible with smoothing on, so
the record reports the floor and the distance to it) and the final
train-set eval scores near-ceiling (CIDEr in the hundreds, SODA >50; an
untrained model scores ~0 on both). Hardware record from round 4:
loss 21.47 -> 3.34 total (generative 11.06 -> 1.412 vs floor 1.357;
denoising bounded by the stochastic span masks), CIDEr 729, SODA_c 50.6,
F1 100.

Why SODA_c sits at ~0.52 even for a PERFECT submission (round-5
diagnosis, reproduced on CPU by scoring the GT against itself): SODA's
per-pair similarity is METEOR, whose fragmentation penalty caps an
IDENTICAL L-word caption at 1 - gamma*(1/L)^beta — 0.5184 for the
3-word synthetic captions here (test_eval_dvc_soda.py pins this
equality). The reference time quantization int(99*t/duration) further
shaves mean event IoU to 0.996, and SODA-c multiplies IoU into the
similarity, giving an achievable ceiling of 0.5163 on this dataset.
The hardware record's 0.506 is 98.0% of that ceiling — the factor-of-2
"gap" vs F1=100/CIDEr=729 is entirely the metric definitions (F1 is
threshold-based, CIDEr has no fragmentation penalty), not a decode or
eval defect. The record emits ``soda_c_ceiling`` so this is
self-explaining.

Runtime on one v5e through the axon tunnel: ~25-40 min TRAIN compile in
the default unrolled layout, or ~1 min with --scan (scan_layers+remat —
same math, much smaller HLO) + minutes of eval-decode compiles + a few
minutes of steps.

Usage: python tpu_overfit.py  [--epochs 300] [--videos 8] [--scan]
Writes OVERFIT_TPU.json and prints one JSON line. --smoke validates the
plumbing at tiny scale and does NOT write the record file.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

import numpy as np


def build_dataset(root: str, n_videos: int, rng: np.random.Generator):
    """Synthetic chapters: per-video distinctive features + captions."""
    from vidchapters_tpu.utils.io import save_pickle

    feat_dir = os.path.join(root, "feats")
    os.makedirs(feat_dir, exist_ok=True)
    nouns = ["pasta", "engine", "garden", "piano", "laptop", "tent",
             "camera", "bread", "rocket", "guitar", "mural", "kite"]
    verbs = ["prepping", "fixing", "planting", "tuning", "building",
             "pitching", "testing", "baking", "launching", "strumming",
             "painting", "flying"]
    ann = {}
    asr = {}
    for i in range(n_videos):
        vid = f"overfitvid{i:02d}"[-11:]
        # distinctive, fixed features: a per-video random pattern the model
        # can key the memorized captions on
        feats = rng.normal(size=(120, 768)).astype(np.float32)
        np.save(os.path.join(feat_dir, f"{vid}.npy"), feats)
        w1, w2 = nouns[i % len(nouns)], verbs[i % len(verbs)]
        ann[vid] = {
            "duration": 90.0,
            "timestamps": [[0.0, 30.0], [30.0, 62.0], [62.0, 90.0]],
            "sentences": [f"{w2} the {w1}",
                          f"{w1} close up",
                          f"final {w1} reveal"],
        }
        asr[vid] = {"text": [f"today we are {w2} a {w1}"],
                    "start": [1.0], "end": [8.0]}
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    asr_path = os.path.join(root, "asr.pkl")
    save_pickle(asr, asr_path)
    return ann_path, asr_path, feat_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--videos", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + CPU-friendly shapes: validates this "
                         "script's plumbing without the recipe-scale compile")
    ap.add_argument("--scan", action="store_true",
                    help="scan_layers+remat layout: same recipe-scale math "
                         "but a ~3.5 min train compile instead of 25-40 min "
                         "(throughput 32.9 vs 44.5 videos/s — irrelevant for "
                         "an overfit proof where compile dominates)")
    args = ap.parse_args()

    from vidchapters_tpu.config import (
        CheckpointConfig, DataConfig, DatasetPaths, ExperimentConfig,
        GenerationConfig, MeshConfig, OptimConfig, T5Config,
        TemporalViTConfig, TrainConfig, Vid2SeqConfig,
    )
    from vidchapters_tpu.train.dvc_main import main as dvc_main

    root = tempfile.mkdtemp(prefix="tpu_overfit_")
    rng = np.random.default_rng(0)
    ann_path, asr_path, feat_dir = build_dataset(root, args.videos, rng)

    from dataclasses import replace

    if args.smoke:
        model_cfg = Vid2SeqConfig(
            t5=T5Config(vocab_size=32200, d_model=64, d_kv=16, d_ff=128,
                        num_layers=2, num_decoder_layers=2, num_heads=4,
                        dtype="float32", dropout_rate=0.0,
                        encoder_dropout=0.0, decoder_dropout=0.0),
            vit=TemporalViTConfig(num_features=16, embed_dim=768, depth=2,
                                  num_heads=4, mlp_dim=128,
                                  dtype="float32"))
        data_cfg = DataConfig(max_feats=16, features_dim=768,
                              max_input_tokens=64, max_output_tokens=64)
        gen_cfg = GenerationConfig(num_beams=1, max_length=48)
    else:
        # full reference recipe shapes (bench.py / README.md:179-185)
        model_cfg = Vid2SeqConfig()  # t5-base + 12-layer temporal ViT
        data_cfg = DataConfig(max_feats=100, features_dim=768,
                              max_input_tokens=1000, max_output_tokens=256)
        gen_cfg = GenerationConfig(num_beams=4, max_length=256)
    if args.scan:
        model_cfg = replace(
            model_cfg,
            t5=replace(model_cfg.t5, scan_layers=True, remat=True),
            vit=replace(model_cfg.vit, scan_layers=True))

    epochs = args.epochs
    cfg = ExperimentConfig(
        combine_datasets=["chapters"],
        datasets={"chapters": DatasetPaths(
            train_json_path=ann_path, val_json_path=ann_path,
            test_json_path=ann_path, features_path=feat_dir,
            subtitles_path=asr_path)},
        data=data_cfg,
        model=model_cfg,
        generation=gen_cfg,
        train=TrainConfig(
            epochs=epochs, batch_size=args.videos,
            eval_batch_size=args.videos, print_freq=50,
            eval_every_epochs=max(1, epochs // 3),
            optim=OptimConfig(lr=args.lr, clip_max_norm=1.0,
                              fraction_warmup_steps=0.05),
            checkpoint=CheckpointConfig(
                save_dir=os.path.join(root, "ckpt"),
                best_metric="soda_c",
                # a full recipe-scale save is minutes of tunnel traffic;
                # per-epoch `last` saves would dominate the whole run
                save_last_every_epochs=epochs),
            mesh=MeshConfig()),
    )

    metrics = dvc_main(cfg)

    # loss trajectory from the per-epoch log
    log_path = os.path.join(root, "ckpt", "log.txt")
    losses, gen_losses = [], []
    with open(log_path) as f:
        for line in f:
            row = json.loads(line)
            for k in ("train_total_loss", "total_loss", "train_loss"):
                if k in row:
                    losses.append(float(row[k]))
                    break
            if "train_loss" in row:  # generative (chapters) component
                gen_losses.append(float(row["train_loss"]))

    # label smoothing puts a hard floor under the CE: at eps the optimum
    # assigns p_target = 1-eps+eps/V, p_other = eps/V, so "loss -> 0" is
    # unreachable by construction — report the floor so the record is
    # self-explaining (the proof is generative loss AT the floor, plus
    # near-ceiling eval metrics).
    eps = model_cfg.t5.label_smoothing
    V = model_cfg.t5.vocab_size
    p_t, p_o = 1.0 - eps + eps / V, eps / V
    floor = -(p_t * np.log(p_t) + (V - 1) * p_o * np.log(p_o))
    # achievable SODA_c ceiling on THIS dataset: score the GT against
    # itself with the reference time quantization applied (SODA-c's
    # per-pair METEOR penalizes fragmentation even on identical captions
    # — see the module docstring)
    from vidchapters_tpu.evals.soda import eval_soda

    ann = json.load(open(ann_path))
    quant_sub = {"results": {
        vid: [{"sentence": s,
               "timestamp": [int(99 * t0 / a["duration"]) / 99
                             * a["duration"],
                             int(99 * t1 / a["duration"]) / 99
                             * a["duration"]]}
              for s, (t0, t1) in zip(a["sentences"], a["timestamps"])]
        for vid, a in ann.items()}}
    soda_ceiling = eval_soda(quant_sub, [ann_path])["soda_c"]
    out = {
        "metric": "tpu_overfit_recipe_scale",
        "loss_first_epoch": round(losses[0], 4) if losses else None,
        "loss_last_epoch": round(losses[-1], 4) if losses else None,
        "generative_loss_first": round(gen_losses[0], 4) if gen_losses else None,
        "generative_loss_last": round(gen_losses[-1], 4) if gen_losses else None,
        "label_smoothing_floor": round(float(floor), 4),
        "cider": round(float(metrics.get("chapters_CIDEr", 0.0)), 4),
        "soda_c": round(float(metrics.get("chapters_soda_c", 0.0)), 4),
        "soda_c_ceiling": round(float(soda_ceiling), 4),
        "f1": round(float(metrics.get("chapters_F1", 0.0)), 4),
        "epochs": epochs,
        "videos": args.videos,
        "scan_layers": bool(model_cfg.t5.scan_layers),
        "workdir": root,
    }
    if not args.smoke:  # don't clobber the hardware record with a smoke run
        with open("OVERFIT_TPU.json", "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
