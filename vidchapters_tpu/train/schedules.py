"""LR schedules matching the reference's step-wise adjustment
(util/misc.py:15-42): linear warmup into constant / linear-decay /
cosine-decay, expressed as optax schedules (pure functions of the step)."""

from __future__ import annotations

import jax.numpy as jnp
import optax

from vidchapters_tpu.config import OptimConfig


def build_schedule(cfg: OptimConfig, num_training_steps: int) -> optax.Schedule:
    warmup = max(int(cfg.fraction_warmup_steps * num_training_steps), 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = cfg.lr * step / warmup
        if cfg.schedule == "linear_with_warmup":
            rest = cfg.lr * jnp.maximum(
                (num_training_steps - step) / max(num_training_steps - warmup, 1), 0.0)
        elif cfg.schedule == "cosine_with_warmup":
            progress = jnp.clip(
                (step - warmup) / max(num_training_steps - warmup, 1), 0.0, 1.0)
            rest = cfg.lr * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        else:  # constant after warmup
            rest = jnp.asarray(cfg.lr)
        return jnp.where(step < warmup, warm, rest)

    return schedule


def build_optimizer(cfg: OptimConfig, num_training_steps: int) -> optax.GradientTransformation:
    """Adam + global-norm clip (dvc.py:112-116, 346-351).

    With ``cfg.fused_flat`` the whole chain runs over one flattened
    parameter vector (optax.flatten): clip becomes a single vector norm
    and the Adam update a few large fusions instead of ~1.1k per-leaf
    ops (the round-2 profile's unattributed tiny-copy tail)."""
    schedule = build_schedule(cfg, num_training_steps)
    chain = []
    if cfg.clip_max_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_max_norm))
    chain.append(optax.adamw(schedule, b1=cfg.beta1, b2=cfg.beta2,
                             weight_decay=cfg.weight_decay,
                             mu_dtype=getattr(jnp, cfg.mu_dtype)))
    tx = optax.chain(*chain)
    if getattr(cfg, "fused_flat", False):
        tx = optax.flatten(tx)
    return tx
