"""Import released PyTorch checkpoints into the Flax parameter tree.

The reference ships torch checkpoints (``{model, optimizer, epoch, args}``
dicts, dvc.py:406-441). This shim maps the HF-T5 + reference-ViT state_dict
layout onto this framework's parameter pytree so paper checkpoints reproduce
their metrics on TPU. It also backs the numerical parity tests (random torch
weights -> Flax forward must match).

All inputs are name->numpy arrays; torch is only needed by the caller to
deserialize ``.pth`` files (``load_torch_checkpoint``).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

Params = Dict[str, Any]


def _t(x: np.ndarray) -> np.ndarray:
    """torch Linear stores [out, in]; flax Dense kernel is [in, out]."""
    return np.ascontiguousarray(x.T)


def _set(tree: Params, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = np.asarray(value, dtype=np.float32)


def convert_t5_state_dict(sd: Mapping[str, np.ndarray], prefix: str = "",
                          gated: bool = False) -> Params:
    """HF ``T5ForConditionalGeneration`` state_dict -> Flax t5 params."""
    p: Params = {}
    g = lambda k: np.asarray(sd[prefix + k])

    _set(p, "shared/embedding", g("shared.weight"))
    for stack, n_layers_key in (("encoder", "encoder"), ("decoder", "decoder")):
        i = 0
        while f"{prefix}{stack}.block.{i}.layer.0.SelfAttention.q.weight" in sd:
            base = f"{stack}.block.{i}.layer.0"
            blk = f"{stack}/block_{i}"
            for w in ("q", "k", "v", "o"):
                _set(p, f"{blk}/self_attn/{w}/kernel",
                     _t(g(f"{base}.SelfAttention.{w}.weight")))
            _set(p, f"{blk}/self_attn_norm/weight", g(f"{base}.layer_norm.weight"))
            if stack == "decoder":
                base_x = f"{stack}.block.{i}.layer.1"
                for w in ("q", "k", "v", "o"):
                    _set(p, f"{blk}/cross_attn/{w}/kernel",
                         _t(g(f"{base_x}.EncDecAttention.{w}.weight")))
                _set(p, f"{blk}/cross_attn_norm/weight", g(f"{base_x}.layer_norm.weight"))
                ff_idx = 2
            else:
                ff_idx = 1
            base_f = f"{stack}.block.{i}.layer.{ff_idx}"
            if gated:
                _set(p, f"{blk}/ff/wi_0/kernel", _t(g(f"{base_f}.DenseReluDense.wi_0.weight")))
                _set(p, f"{blk}/ff/wi_1/kernel", _t(g(f"{base_f}.DenseReluDense.wi_1.weight")))
            else:
                _set(p, f"{blk}/ff/wi/kernel", _t(g(f"{base_f}.DenseReluDense.wi.weight")))
            _set(p, f"{blk}/ff/wo/kernel", _t(g(f"{base_f}.DenseReluDense.wo.weight")))
            _set(p, f"{blk}/ff_norm/weight", g(f"{base_f}.layer_norm.weight"))
            i += 1
        _set(p, f"{stack}/final_norm/weight", g(f"{stack}.final_layer_norm.weight"))
        _set(p, f"{stack}/rel_bias/rel_embedding",
             g(f"{stack}.block.0.layer.0.SelfAttention.relative_attention_bias.weight"))
    if prefix + "lm_head.weight" in sd:
        lm = np.asarray(sd[prefix + "lm_head.weight"])
        if not np.array_equal(lm, np.asarray(sd[prefix + "shared.weight"])):
            _set(p, "lm_head/kernel", _t(lm))
    return p


def convert_vit_state_dict(sd: Mapping[str, np.ndarray], prefix: str = "") -> Params:
    """Reference ``VisionTransformer`` state_dict (model/vit.py) -> Flax params."""
    p: Params = {}
    g = lambda k: np.asarray(sd[prefix + k])
    _set(p, "pos_embed", g("pos_embed"))
    i = 0
    while f"{prefix}blocks.{i}.norm1.weight" in sd:
        blk = f"block_{i}"
        _set(p, f"{blk}/norm1/scale", g(f"blocks.{i}.norm1.weight"))
        _set(p, f"{blk}/norm1/bias", g(f"blocks.{i}.norm1.bias"))
        _set(p, f"{blk}/attn/qkv/kernel", _t(g(f"blocks.{i}.attn.qkv.weight")))
        if f"{prefix}blocks.{i}.attn.qkv.bias" in sd:
            _set(p, f"{blk}/attn/qkv/bias", g(f"blocks.{i}.attn.qkv.bias"))
        _set(p, f"{blk}/attn/proj/kernel", _t(g(f"blocks.{i}.attn.proj.weight")))
        _set(p, f"{blk}/attn/proj/bias", g(f"blocks.{i}.attn.proj.bias"))
        _set(p, f"{blk}/norm2/scale", g(f"blocks.{i}.norm2.weight"))
        _set(p, f"{blk}/norm2/bias", g(f"blocks.{i}.norm2.bias"))
        _set(p, f"{blk}/fc1/kernel", _t(g(f"blocks.{i}.mlp.fc1.weight")))
        _set(p, f"{blk}/fc1/bias", g(f"blocks.{i}.mlp.fc1.bias"))
        _set(p, f"{blk}/fc2/kernel", _t(g(f"blocks.{i}.mlp.fc2.weight")))
        _set(p, f"{blk}/fc2/bias", g(f"blocks.{i}.mlp.fc2.bias"))
        i += 1
    _set(p, "norm/scale", g("norm.weight"))
    _set(p, "norm/bias", g("norm.bias"))
    return p


def convert_vid2seq_state_dict(sd: Mapping[str, np.ndarray],
                               gated: bool = False) -> Params:
    """Full reference Vid2Seq checkpoint -> {"t5": ..., "visual_encoder": ...}."""
    out: Params = {
        "t5": convert_t5_state_dict(sd, prefix="t5_model.", gated=gated),
        "visual_encoder": convert_vit_state_dict(sd, prefix="visual_encoder."),
    }
    if "proj_v2t.weight" in sd:
        out["proj_v2t"] = {
            "kernel": _t(np.asarray(sd["proj_v2t.weight"])),
            "bias": np.asarray(sd["proj_v2t.bias"], dtype=np.float32),
        }
    return out


def _stack_trees(trees):
    if isinstance(trees[0], dict):
        return {k: _stack_trees([t[k] for t in trees]) for k in trees[0]}
    return np.stack([np.asarray(t) for t in trees])


def stack_scanned_layers(stack_params: Params) -> Params:
    """``block_{i}`` children -> one ``blocks`` subtree with a leading
    [n_layers] axis (the ``T5Config.scan_layers`` param layout)."""
    n = 0
    while f"block_{n}" in stack_params:
        n += 1
    out = {k: v for k, v in stack_params.items() if not k.startswith("block_")}
    out["blocks"] = _stack_trees([stack_params[f"block_{i}"] for i in range(n)])
    return out


def scan_t5_params(t5_params: Params, which: Any = True) -> Params:
    """Unrolled T5 param tree -> scanned layout.

    ``which`` mirrors T5Config.scan_layers: True (both stacks) or
    "encoder" / "decoder" for per-stack scanning."""
    stacks = (("encoder", "decoder") if which is True
              else (which,) if isinstance(which, str) else ())
    out = dict(t5_params)
    for stack in stacks:
        out[stack] = stack_scanned_layers(t5_params[stack])
    return out


def _unstack_trees(tree) -> list:
    if isinstance(tree, dict):
        per_key = {k: _unstack_trees(v) for k, v in tree.items()}
        n = len(next(iter(per_key.values())))
        return [{k: v[i] for k, v in per_key.items()} for i in range(n)]
    arr = np.asarray(tree)
    return [arr[i] for i in range(arr.shape[0])]


def unscan_stacked_layers(stack_params: Params) -> Params:
    """Inverse of :func:`stack_scanned_layers`: the ``blocks`` subtree's
    leading [n_layers] axis -> ``block_{i}`` children (for serving a
    scan_layers-trained orbax checkpoint with an unrolled config)."""
    out = {k: v for k, v in stack_params.items() if k != "blocks"}
    for i, blk in enumerate(_unstack_trees(stack_params["blocks"])):
        out[f"block_{i}"] = blk
    return out


def unscan_t5_params(t5_params: Params) -> Params:
    """Scanned T5 param tree -> unrolled layout (stacks left untouched if
    already unrolled)."""
    out = dict(t5_params)
    for stack in ("encoder", "decoder"):
        if "blocks" in t5_params[stack]:
            out[stack] = unscan_stacked_layers(t5_params[stack])
    return out


def _fuse_attn(attn: Params, heads: int, d_kv: int, packed: int) -> Params:
    """Pack per-projection kernels into one [..., d_model, heads, P, d_kv]
    param (P=3 self qkv, P=2 cross kv). Works on unrolled leaves and on
    scanned leaves with a leading layer axis alike."""
    names = ("q", "k", "v") if packed == 3 else ("k", "v")
    mats = []
    for nm in names:
        w = np.asarray(attn[nm]["kernel"])
        mats.append(w.reshape(w.shape[:-1] + (heads, d_kv)))
    fused = np.stack(mats, axis=-2)  # [..., d_model, heads, P, d_kv]
    out = {k: v for k, v in attn.items() if k not in names}
    out["qkv" if packed == 3 else "kv"] = {"kernel": fused}
    return out


def _unfuse_attn(attn: Params, xp=np) -> Params:
    """Packed qkv/kv kernel -> separate q/k/v entries. ``xp`` picks the
    array namespace (numpy for checkpoint transforms; decode_megakernel
    passes jax.numpy at generate-fn setup) so the packed-layout format —
    axis order [..., d, heads, P, d_kv], P=3/2 discrimination, key naming
    — lives in exactly one place. No-op if already unfused."""
    key = "qkv" if "qkv" in attn else ("kv" if "kv" in attn else None)
    if key is None:
        return attn
    fused = xp.asarray(attn[key]["kernel"])  # [..., d, heads, P, d_kv]
    packed = fused.shape[-2]
    flat = fused.shape[:-3] + (fused.shape[-3] * fused.shape[-1],)
    names = ("q", "k", "v") if packed == 3 else ("k", "v")
    out = {k: v for k, v in attn.items() if k != key}
    for i, nm in enumerate(names):
        out[nm] = {"kernel": xp.reshape(xp.ascontiguousarray(fused[..., i, :])
                                        if xp is np else fused[..., i, :],
                                        flat)}
    return out


def _map_attention_blocks(stack: Params, fn) -> Params:
    """Apply ``fn(attn_subtree, role)`` to every attention in a T5 stack
    (unrolled ``block_{i}`` or scanned ``blocks`` layout)."""
    out = dict(stack)
    for key, blk in stack.items():
        if key != "blocks" and not key.startswith("block_"):
            continue
        new_blk = dict(blk)
        if "self_attn" in blk:
            new_blk["self_attn"] = fn(blk["self_attn"], "self")
        if "cross_attn" in blk:
            new_blk["cross_attn"] = fn(blk["cross_attn"], "cross")
        out[key] = new_blk
    return out


def fuse_t5_attention_params(t5_params: Params, num_heads: int,
                             d_kv: int) -> Params:
    """Separate q/k/v kernels -> the ``T5Config.fused_qkv`` packed layout."""

    def fn(attn, role):
        if "qkv" in attn or "kv" in attn:
            return attn  # already fused
        return _fuse_attn(attn, num_heads, d_kv, 3 if role == "self" else 2)

    out = dict(t5_params)
    for stack in ("encoder", "decoder"):
        if stack in t5_params:
            out[stack] = _map_attention_blocks(t5_params[stack], fn)
    return out


def unfuse_t5_attention_params(t5_params: Params) -> Params:
    """Inverse of :func:`fuse_t5_attention_params` (no-op if unfused)."""

    def fn(attn, role):
        if "qkv" not in attn and "kv" not in attn:
            return attn
        return _unfuse_attn(attn)

    out = dict(t5_params)
    for stack in ("encoder", "decoder"):
        if stack in t5_params:
            out[stack] = _map_attention_blocks(t5_params[stack], fn)
    return out


def apply_param_layouts(params: Params, model_cfg) -> Params:
    """Bring a converted (unrolled, unfused) Vid2Seq param tree to the
    layouts ``model_cfg`` requests: fused_qkv packing, then scan stacking.
    Shared by dvc_main --load, serve --ckpt and demo_vid2seq."""
    t5 = model_cfg.t5
    if getattr(t5, "fused_qkv", False):
        params = dict(params)
        params["t5"] = fuse_t5_attention_params(
            params["t5"], t5.num_heads, t5.d_kv)
    if t5.scan_layers or model_cfg.vit.scan_layers:
        params = scan_vid2seq_params(params, t5=t5.scan_layers,
                                     vit=model_cfg.vit.scan_layers)
    return params


def scan_vid2seq_params(params: Params, t5: Any = True,
                        vit: bool = True) -> Params:
    """Unrolled Vid2Seq param tree -> the scan_layers layouts requested by
    ``T5Config.scan_layers`` / ``TemporalViTConfig.scan_layers``."""
    out = dict(params)
    if t5:
        out["t5"] = scan_t5_params(params["t5"], which=t5)
    if vit and "visual_encoder" in params:
        out["visual_encoder"] = stack_scanned_layers(params["visual_encoder"])
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth`` checkpoint into numpy (CPU torch required)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    # strip DDP "module." prefixes if present
    return {k.removeprefix("module."): v.numpy() for k, v in sd.items()}
