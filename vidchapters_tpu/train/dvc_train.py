"""Vid2Seq DVC / chapter-generation training + evaluation (jit'd steps).

TPU-native counterpart of the dvc.py training loop (dvc.py:26-240):

- one jit'd ``train_step`` computes the generative loss, reuses the visual
  encoding for the denoising forward (dvc.py:78-100), sums weighted losses,
  clips the global grad norm, applies Adam with the cosine/warmup schedule,
  and renormalizes the time-token embedding rows to the frozen rows' mean
  norm (dvc.py:118-126) — all fused into a single XLA program;
- ``evaluate`` runs jit'd beam-4 decode with a static KV cache, decodes time
  tokens on the host (dvc.py:186-212 via data.time_tokens), and scores with
  eval_dvc + eval_soda.

Unlike the reference (which never wraps the model in DDP — SURVEY.md §2.8),
gradients here are genuinely averaged across the data axis by XLA collectives
because batches are sharded over the mesh and params are replicated.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vidchapters_tpu.config import GenerationConfig
from vidchapters_tpu.models.vid2seq import Vid2Seq
from vidchapters_tpu.ops.decoding import beam_search, greedy_decode, make_decode_fns, nucleus_sample
from vidchapters_tpu.data.time_tokens import decode_chapter_sequence


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def renorm_time_tokens(params: Dict[str, Any], num_bins: int) -> Dict[str, Any]:
    """Scale time-token embedding rows so their mean L2 norm matches the text
    rows' mean norm (dvc.py:118-126). With tied embeddings the reference's
    two consecutive renorms (shared + lm_head aliasing the same tensor) reduce
    to one."""
    emb = params["t5"]["shared"]["embedding"]
    frozen, trainable = emb[:-num_bins], emb[-num_bins:]
    frozen_norm = jnp.linalg.norm(frozen.astype(jnp.float32), axis=1).mean()
    train_norm = jnp.linalg.norm(trainable.astype(jnp.float32), axis=1).mean()
    scaled = trainable * (frozen_norm / jnp.maximum(train_norm, 1e-8)).astype(emb.dtype)
    new_emb = jnp.concatenate([frozen, scaled], axis=0)
    new_params = dict(params)
    new_t5 = dict(params["t5"])
    new_t5["shared"] = {"embedding": new_emb}
    new_params["t5"] = new_t5
    if "lm_head" in params["t5"]:  # untied variant: renorm the head too
        head = params["t5"]["lm_head"]["kernel"]  # [d, vocab]
        hf, ht = head[:, :-num_bins], head[:, -num_bins:]
        fn = jnp.linalg.norm(hf.astype(jnp.float32), axis=0).mean()
        tn = jnp.linalg.norm(ht.astype(jnp.float32), axis=0).mean()
        new_t5["lm_head"] = {"kernel": jnp.concatenate(
            [hf, ht * (fn / jnp.maximum(tn, 1e-8)).astype(head.dtype)], axis=1)}
    return new_params


def make_train_step(model: Vid2Seq, tx: optax.GradientTransformation,
                    generative: float = 1.0, denoising: float = 1.0,
                    genasr: bool = False) -> Callable:
    """Build the jit-able train step (loss structure from dvc.py:58-100)."""

    num_bins = model.cfg.num_bins

    def loss_fn(params, batch, rng):
        losses = {}
        video_embeds = None
        rng_gen, rng_den = jax.random.split(rng)
        if generative:
            if genasr:  # HowTo100M: generate ASR from video only (dvc.py:59-68)
                inp = jnp.ones((batch["video"].shape[0], 1), jnp.int32)
                out = model.apply(
                    {"params": params}, batch["video"], inp,
                    (inp != 0).astype(jnp.int32), batch["output_tokens"],
                    deterministic=False, rngs={"dropout": rng_gen})
            else:
                out = model.apply(
                    {"params": params}, batch["video"], batch["input_tokens"],
                    (batch["input_tokens"] != 0).astype(jnp.int32),
                    batch["output_tokens"],
                    deterministic=False, rngs={"dropout": rng_gen})
            losses["loss"] = out["loss"]
            video_embeds = out.get("video_embeds")
        if denoising:
            out_d = model.apply(
                {"params": params}, batch["video"],
                batch["denoising_input_tokens"],
                (batch["denoising_input_tokens"] != 0).astype(jnp.int32),
                batch["denoising_output_tokens"],
                deterministic=False, rngs={"dropout": rng_den},
                video_embeds=video_embeds)
            losses["denoising_loss"] = out_d["loss"]
        total = (generative * losses.get("loss", 0.0)
                 + denoising * losses.get("denoising_loss", 0.0))
        return total, losses

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = renorm_time_tokens(params, num_bins)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def _pick_decode_fns(model: Vid2Seq, params, gen: GenerationConfig,
                     enc_out):
    """Standard decode fns, or the cross-layer megakernel when enabled
    (models.t5.USE_MEGA_DECODE) and the batch/beam geometry tiles."""
    from vidchapters_tpu.models import t5 as t5_mod

    beams = gen.num_beams if gen.num_beams > 1 else 1
    # gen.num_beams >= 1 keeps the sampling path (num_beams == 0 routes to
    # nucleus_sample in make_generate_fn) on the standard decode fns — the
    # megakernel geometry guard was only validated for greedy/beam decode
    use_mega = (t5_mod._mega_decode_enabled()
                and not gen.use_nucleus_sampling
                and gen.num_beams >= 1
                and isinstance(params, dict) and "t5" in params
                # gated-gelu (t5-v1_1) streams wi as [d, 2*dff] and slices
                # at dff inside the kernel — the split point must sit on a
                # 128-lane boundary (always true for real v1_1 sizes)
                and (not model.cfg.t5.is_gated_act
                     or model.cfg.t5.d_ff % 128 == 0)
                and beams in (1, 2, 4, 8))
    if use_mega:
        bb = beams * max(1, 8 // beams)
        if (enc_out.shape[0] * beams) % bb == 0:
            from vidchapters_tpu.ops.decode_megakernel import (
                make_mega_decode_fns,
            )

            return make_mega_decode_fns(
                model.cfg.t5, params["t5"], gen.max_length,
                num_beams=beams,
                interpret=jax.default_backend() == "cpu")
    return make_decode_fns(model, params, gen.max_length)


def make_generate_fn(model: Vid2Seq, gen: GenerationConfig) -> Callable:
    """jit'd generation: encode once, decode with static KV cache.

    Decode matmuls have few rows (batch x beams), so they are HBM-bound on
    weight reads; per ``gen.param_dtype`` the f32 master weights are cast
    once (XLA hoists the cast out of the decode loop), halving weight
    traffic at bfloat16."""
    cast_to = getattr(jnp, getattr(gen, "param_dtype", "float32"), None)

    @functools.partial(jax.jit, static_argnames=())
    def generate(params, video, input_tokens, rng):
        if cast_to is not None and cast_to != jnp.float32:
            params = jax.tree.map(
                lambda x: x.astype(cast_to)
                if x.dtype == jnp.float32 else x, params)
        attn = (input_tokens != 0).astype(jnp.int32)
        enc_out, enc_mask = model.apply(
            {"params": params}, video, input_tokens, attn,
            method=model.encode_for_generation)
        fns = _pick_decode_fns(model, params, gen, enc_out)
        if gen.use_nucleus_sampling or gen.num_beams == 0:
            return nucleus_sample(fns, enc_out, enc_mask, gen.max_length, rng,
                                  top_p=gen.top_p, temperature=gen.temperature,
                                  min_length=gen.min_length)
        if gen.num_beams <= 1:
            return greedy_decode(fns, enc_out, enc_mask, gen.max_length,
                                 min_length=gen.min_length,
                                 repetition_penalty=gen.repetition_penalty)
        return beam_search(fns, enc_out, enc_mask, gen.max_length,
                           num_beams=gen.num_beams,
                           length_penalty=gen.length_penalty,
                           min_length=gen.min_length,
                           repetition_penalty=gen.repetition_penalty)

    return generate


def evaluate(model: Vid2Seq, params, data_iter, tokenizer,
             gen: GenerationConfig, num_bins: int,
             references: Optional[list] = None,
             seed: int = 0) -> Tuple[Dict[str, list], Dict[str, float]]:
    """Decode every batch, regex-parse chapters, optionally score.

    Returns (predictions dict in the reference's submission schema
    ``{vid: [{sentence, timestamp}]}``, metrics)."""
    generate = make_generate_fn(model, gen)
    rng = jax.random.PRNGKey(seed)
    results: Dict[str, list] = {}
    for batch in data_iter:
        rng, sub = jax.random.split(rng)
        input_tokens = batch.get("input_tokens")
        if input_tokens is None:
            input_tokens = np.ones((batch["video"].shape[0], 1), np.int32)
        seqs = generate(params, jnp.asarray(batch["video"]),
                        jnp.asarray(input_tokens), sub)
        texts = tokenizer.batch_decode(np.asarray(seqs), skip_special_tokens=True)
        for i, vid in enumerate(batch["video_id"]):
            results[vid] = decode_chapter_sequence(
                texts[i], float(batch["duration"][i]), num_bins)
    # merge per-host shards (the pickled all_gather at dvc.py:214-215)
    from vidchapters_tpu.runtime.collectives import gather_results

    results = gather_results(results)
    metrics: Dict[str, float] = {}
    if references:
        from vidchapters_tpu.evals.dvc import eval_dvc
        from vidchapters_tpu.evals.soda import eval_soda

        submission = {"results": results}
        metrics.update(eval_dvc(submission, references, seed=seed))
        metrics.update(eval_soda(submission, references))
    return results, metrics
