"""VC (chapter titles with GT boundaries) training orchestrator.

The vc.py:178-330 equivalent: per-epoch clip-level training with tokenization
in the loop, COCO-captioning eval, best checkpoint on CIDEr, and optional
DVC-checkpoint import with time-token stripping (vc.py:304-308).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vidchapters_tpu.config import DataConfig, GenerationConfig, Vid2SeqConfig
from vidchapters_tpu.data.tokenizer import build_tokenizer
from vidchapters_tpu.data.vc_dataset import VideoCaptioningDataset, vc_collate
from vidchapters_tpu.models.vid2seq import Vid2Seq
from vidchapters_tpu.runtime.checkpoint import CheckpointManager
from vidchapters_tpu.runtime.meters import MetricLogger
from vidchapters_tpu.runtime.rng import fast_train_key
from vidchapters_tpu.train.dvc_train import TrainState
from vidchapters_tpu.train.vc_train import (
    evaluate_vc,
    make_vc_train_step,
    tokenize_batch,
)


def main(train_json: str, val_json: str, features_path,
         model_cfg: Vid2SeqConfig, data_cfg: DataConfig, save_dir: str,
         subtitles_path: Optional[str] = None, tokenizer_path: str = "",
         n_epochs: int = 20, batch_size: int = 16, lr: float = 3e-4,
         seed: int = 0, init_params=None,
         generation: GenerationConfig = GenerationConfig(num_beams=4,
                                                         max_length=32)
         ) -> Dict[str, float]:
    import optax

    tokenizer = build_tokenizer(tokenizer_path, num_bins=model_cfg.num_bins)
    train_ds = VideoCaptioningDataset(train_json, features_path, training=True,
                                      cfg=data_cfg,
                                      subtitles_path=subtitles_path)
    val_ds = VideoCaptioningDataset(val_json, features_path, training=False,
                                    cfg=data_cfg, subtitles_path=subtitles_path)

    model = Vid2Seq(model_cfg)
    rng = jax.random.PRNGKey(seed)
    step_key = fast_train_key(seed)
    d = data_cfg
    if init_params is None:
        init_params = model.init(
            {"params": rng, "dropout": rng},
            jnp.zeros((1, d.max_feats, d.features_dim), jnp.float32),
            jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32),
            jnp.ones((1, 8), jnp.int32))["params"]

    tx = optax.chain(optax.clip_by_global_norm(0.1), optax.adam(lr))
    train_step = jax.jit(make_vc_train_step(model, tx))
    state = TrainState(init_params, tx.init(init_params), jnp.array(0))
    ckpt = CheckpointManager(save_dir, best_metric="CIDEr")
    log_path = Path(save_dir) / "log.txt"

    np_rng = np.random.default_rng(seed)
    for epoch in range(n_epochs):
        logger = MetricLogger()
        order = np_rng.permutation(len(train_ds))
        for s in range(0, len(order) - batch_size + 1, batch_size):
            batch = vc_collate([train_ds.__getitem__(int(i), rng=np_rng)
                                for i in order[s:s + batch_size]])
            arrays = {
                "video": jnp.asarray(batch["video"]),
                "input_tokens": jnp.asarray(tokenize_batch(
                    batch["input_text"], tokenizer, d.max_input_tokens)),
                "output_tokens": jnp.asarray(tokenize_batch(
                    batch["output_text"], tokenizer, d.max_output_tokens,
                    buckets=d.output_buckets)),
            }
            state, metrics = train_step(state, arrays, step_key)
            logger.update(loss=float(metrics["loss"]))

        _, metrics = evaluate_vc(model, state.params, val_ds, tokenizer,
                                 generation,
                                 max_input_tokens=d.max_input_tokens)
        ckpt.maybe_save_best((state.params,), epoch, metrics)
        ckpt.save_last((state.params,), epoch)
        with open(log_path, "a") as f:
            f.write(json.dumps({"epoch": epoch,
                                **logger.global_averages(), **metrics}) + "\n")

    if ckpt.has("best"):
        (params,) = ckpt.restore("best", (state.params,))
    else:
        params = state.params
    _, final_metrics = evaluate_vc(model, params, val_ds, tokenizer,
                                   generation,
                                   max_input_tokens=d.max_input_tokens)
    return final_metrics


if __name__ == "__main__":  # vc.py CLI equivalent
    import argparse
    import json as _json

    from vidchapters_tpu.config import (DataConfig, Vid2SeqConfig,
                                        load_config)

    p = argparse.ArgumentParser(
        description="Video-captioning (Vid2Seq) training / zero-shot eval")
    p.add_argument("--train-json", default=None,
                   help="required unless --eval")
    p.add_argument("--val-json", required=True)
    p.add_argument("--features-path", required=True)
    p.add_argument("--save-dir", required=True)
    p.add_argument("--model-config", default=None, help="Vid2SeqConfig json")
    p.add_argument("--data-config", default=None, help="DataConfig json")
    p.add_argument("--subtitles-path", default=None)
    p.add_argument("--tokenizer-path", default="")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    # eval-only dispatches (vc.py --eval with its model choice,
    # vc.py:109-154: random echoes the ASR; blip2 captions first frames;
    # llama titles from the ASR prompt)
    p.add_argument("--eval", action="store_true",
                   help="skip training; run the chosen zero-shot evaluator "
                        "on --val-json")
    p.add_argument("--model-type", default="random",
                   choices=["random", "blip2", "llama"],
                   help="--eval captioner (vc.py model selection)")
    p.add_argument("--blip2-dir", default=None,
                   help="HF blip2-flan-t5-xl dir for --model-type blip2")
    p.add_argument("--llama-dir", default=None,
                   help="HF LLaMA dir for --model-type llama")
    p.add_argument("--videos-path", default=None,
                   help="json mapping vid -> raw video path (blip2 eval "
                        "needs first frames)")
    a = p.parse_args()
    model_cfg = (load_config(Vid2SeqConfig, a.model_config)
                 if a.model_config else Vid2SeqConfig())
    data_cfg = (load_config(DataConfig, a.data_config)
                if a.data_config else DataConfig())
    if a.eval:
        from vidchapters_tpu.data.vc_dataset import VideoCaptioningDataset
        from vidchapters_tpu.train.vc_train import (
            evaluate_vc_blip2,
            evaluate_vc_llama,
            evaluate_vc_with_captioner,
        )

        ds = VideoCaptioningDataset(a.val_json, a.features_path,
                                    training=False, cfg=data_cfg,
                                    subtitles_path=a.subtitles_path,
                                    videos_path=a.videos_path)
        if a.model_type == "random":
            # the --random baseline scores the ASR text itself (vc.py:109)
            _, metrics = evaluate_vc_with_captioner(
                ds, lambda clip, asr: asr)
        elif a.model_type == "blip2":
            if not a.blip2_dir or not a.videos_path:
                p.error("--model-type blip2 needs --blip2-dir and "
                        "--videos-path")
            from vidchapters_tpu.models.blip2 import build_blip2_captioner

            _, metrics = evaluate_vc_blip2(
                ds, build_blip2_captioner(a.blip2_dir))
        else:
            if not a.llama_dir:
                p.error("--model-type llama needs --llama-dir")
            from vidchapters_tpu.models.llama import build_llama_titler

            _, metrics = evaluate_vc_llama(
                ds, build_llama_titler(a.llama_dir))
        print(_json.dumps(metrics))
    else:
        if not a.train_json:
            p.error("--train-json required without --eval")
        print(_json.dumps(main(a.train_json, a.val_json, a.features_path,
                               model_cfg, data_cfg, a.save_dir,
                               subtitles_path=a.subtitles_path,
                               tokenizer_path=a.tokenizer_path,
                               n_epochs=a.epochs, batch_size=a.batch_size,
                               lr=a.lr, seed=a.seed)))
