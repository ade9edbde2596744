"""Chapter-title captioning with GT boundaries (VC task).

Counterpart of vc.py:26-176: the Vid2Seq model trains on (clip features,
clip ASR) -> title with the generative loss only; evaluation generates a
title per GT clip and scores with the COCO captioning metrics
(dvc_eval/eval_vc.py via evals.captioning). Tokenization happens here in the
loop (vc.py:48-49), padded to static shapes before the jit boundary.

``strip_time_tokens`` reproduces vc.py:304-308: loading a DVC checkpoint for
the VC task slices the time-token rows off the embedding (the VC variant
trains with text-only vocab).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidchapters_tpu.config import GenerationConfig
from vidchapters_tpu.models.vid2seq import Vid2Seq
from vidchapters_tpu.train.dvc_train import make_generate_fn


def tokenize_batch(texts: List[str], tokenizer, max_tokens: int,
                   buckets=None) -> np.ndarray:
    """Tokenize + zero-pad to ``max_tokens``; with ``buckets``
    (``DataConfig.output_buckets``-style) pad instead to the smallest
    bucket covering the batch — chapter titles are far shorter than
    ``max_output_tokens`` and decoder FLOPs scale with padded length."""
    ids_list = []
    for t in texts:
        ids = tokenizer.encode(t, add_special_tokens=True,
                               max_length=max_tokens, truncation=True)
        if not ids or ids[-1] != tokenizer.eos_token_id:
            ids = (ids + [tokenizer.eos_token_id])[:max_tokens]
        ids_list.append(ids)
    if buckets:
        from vidchapters_tpu.data.dvc_dataset import pick_bucket

        max_tokens = pick_bucket(max(len(i) for i in ids_list), buckets,
                                 max_tokens)
    out = np.zeros((len(texts), max_tokens), np.int64)
    for i, ids in enumerate(ids_list):
        out[i, : len(ids)] = ids
    return out


def strip_time_tokens(params: Dict, num_bins: int) -> Dict:
    """Drop the trailing time-token rows from embeddings (vc.py:304-308)."""
    import copy

    p = copy.deepcopy(params)
    emb = np.asarray(p["t5"]["shared"]["embedding"])
    p["t5"]["shared"]["embedding"] = emb[:-num_bins]
    if "lm_head" in p["t5"]:
        head = np.asarray(p["t5"]["lm_head"]["kernel"])
        p["t5"]["lm_head"]["kernel"] = head[:, :-num_bins]
    return p


def make_vc_train_step(model: Vid2Seq, tx) -> Callable:
    import optax

    def loss_fn(params, batch, rng):
        out = model.apply({"params": params}, batch["video"],
                          batch["input_tokens"],
                          (batch["input_tokens"] != 0).astype(jnp.int32),
                          batch["output_tokens"], deterministic=False,
                          rngs={"dropout": rng})
        return out["loss"]

    def train_step(state, batch, rng):
        from vidchapters_tpu.train.dvc_train import TrainState

        step_rng = jax.random.fold_in(rng, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, opt_state, state.step + 1),
                {"loss": loss, "grad_norm": optax.global_norm(grads)})

    return train_step


def evaluate_vc_with_captioner(dataset, captioner) -> Tuple[Dict, Dict[str, float]]:
    """Zero-shot VC eval with any captioner (the BLIP-2 / LLaMA dispatch of
    vc.py:109-154,268-283): ``captioner(video_clip, asr_text) -> str``."""
    from vidchapters_tpu.evals.captioning import eval_vc

    results = {}
    uid = 0
    for idx in range(len(dataset)):
        ex = dataset[idx]
        for clip, asr, gt in zip(ex["video"], ex["input_text"],
                                 ex["output_text"]):
            results[uid] = {"sentence": captioner(clip, asr), "gt": gt}
            uid += 1
    return results, (eval_vc(results) if results else {})


# exact reference prompts (vc.py:112, vc.py:127-128)
VC_BLIP2_PROMPT = "Summarize the image in a chapter title. Chapter title:"
VC_LLAMA_PROMPT = ("Summarize the following speech transcript in a chapter "
                   "title. Transcript:{} Chapter title:")


def evaluate_vc_blip2(dataset, caption_fn) -> Tuple[Dict, Dict[str, float]]:
    """The BLIP-2 eval dispatch (vc.py:111-124): caption the first raw frame
    of every clip with the fixed prompt.  ``caption_fn`` comes from
    ``models.blip2.build_blip2_captioner``; the dataset must be built with
    ``videos_path`` so examples carry ``raw_first_frames``."""
    from vidchapters_tpu.evals.captioning import eval_vc

    results = {}
    uid = 0
    for idx in range(len(dataset)):
        ex = dataset[idx]
        preds = caption_fn(ex["raw_first_frames"], VC_BLIP2_PROMPT)
        for pred, gt in zip(preds, ex["output_text"]):
            results[uid] = {"sentence": pred.strip(), "gt": gt}
            uid += 1
    return results, (eval_vc(results) if results else {})


def evaluate_vc_llama(dataset, generate_fn) -> Tuple[Dict, Dict[str, float]]:
    """The LLaMA eval dispatch (vc.py:126-139): prompt on each clip's ASR
    text; the continuation is the title.  ``generate_fn`` comes from
    ``models.llama.build_llama_titler``."""
    from vidchapters_tpu.evals.captioning import eval_vc

    results = {}
    uid = 0
    for idx in range(len(dataset)):
        ex = dataset[idx]
        for asr, gt in zip(ex["input_text"], ex["output_text"]):
            pred = generate_fn(VC_LLAMA_PROMPT.format(asr))
            results[uid] = {"sentence": pred.strip(), "gt": gt}
            uid += 1
    return results, (eval_vc(results) if results else {})


def evaluate_vc(model: Vid2Seq, params, dataset, tokenizer,
                gen: GenerationConfig, max_input_tokens: int = 256,
                batch_clips: int = 16, seed: int = 0
                ) -> Tuple[Dict, Dict[str, float]]:
    """Per-clip generation over every video, then COCO captioning metrics
    (vc.py:89-176 + dvc_eval/eval_vc.py)."""
    from vidchapters_tpu.evals.captioning import eval_vc

    generate = make_generate_fn(model, gen)
    rng = jax.random.PRNGKey(seed)
    results = {}
    uid = 0
    for idx in range(len(dataset)):
        ex = dataset[idx]
        clips = ex["video"]  # [n_clips, T, D]
        inputs = tokenize_batch(ex["input_text"], tokenizer, max_input_tokens)
        texts: List[str] = []
        for s in range(0, len(clips), batch_clips):
            rng, sub = jax.random.split(rng)
            seqs = generate(params, jnp.asarray(clips[s:s + batch_clips]),
                            jnp.asarray(inputs[s:s + batch_clips]), sub)
            texts.extend(tokenizer.batch_decode(np.asarray(seqs),
                                                skip_special_tokens=True))
        for pred, gt in zip(texts, ex["output_text"]):
            results[uid] = {"sentence": pred, "gt": gt}
            uid += 1
    metrics = eval_vc(results) if results else {}
    return results, metrics
