"""Migrate a saved checkpoint between unrolled and scanned param layouts.

``T5Config.scan_layers`` / ``TemporalViTConfig.scan_layers`` change the
param-tree layout (``block_{i}`` children vs one ``blocks`` subtree with a
leading layer axis). A model trained under one layout serves under the
other after this migration; opt state is NOT migrated — the output is a
params-only checkpoint for `dvc_main --load` / `serve --ckpt`
(training resume must stay on its original layout).

Usage:
    python -m vidchapters_tpu.utils.migrate_ckpt \
        --src /runs/exp1/ckpt --name best --dst /runs/exp1/ckpt_scanned \
        --to scanned [--t5-stacks decoder]
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any


def _detect_vid2seq(tree: Any) -> Any:
    """Accept {'t5': ..., 'visual_encoder': ...} trees or bare t5 trees."""
    if "t5" in tree:
        return tree
    if "encoder" in tree and "decoder" in tree:
        return {"t5": tree}
    raise ValueError(f"unrecognized param tree (top keys: {list(tree)})")


def migrate_params(tree: Any, to: str, t5_stacks: Any = True,
                   vit: bool = True, fuse: str = "keep",
                   num_heads: int = 12, d_kv: int = 64) -> Any:
    from vidchapters_tpu.models.torch_import import (
        fuse_t5_attention_params,
        scan_vid2seq_params,
        unfuse_t5_attention_params,
        unscan_stacked_layers,
        unscan_t5_params,
    )

    wrapped = _detect_vid2seq(tree)
    bare_t5 = wrapped is not tree
    if to == "scanned":
        out = scan_vid2seq_params(wrapped, t5=t5_stacks, vit=vit)
    elif to == "unrolled":
        out = dict(wrapped)
        out["t5"] = unscan_t5_params(wrapped["t5"])
        ve = wrapped.get("visual_encoder")
        if ve is not None and "blocks" in ve:
            out["visual_encoder"] = unscan_stacked_layers(ve)
    else:
        raise ValueError(to)
    if fuse == "fuse":
        out = dict(out)
        out["t5"] = fuse_t5_attention_params(out["t5"], num_heads, d_kv)
    elif fuse == "unfuse":
        out = dict(out)
        out["t5"] = unfuse_t5_attention_params(out["t5"])
    elif fuse != "keep":
        raise ValueError(fuse)
    return out["t5"] if bare_t5 else out


def main(args=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", required=True, help="source checkpoint dir")
    p.add_argument("--name", default="best", help="checkpoint name (best/last)")
    p.add_argument("--dst", required=True, help="destination checkpoint dir")
    p.add_argument("--to", required=True, choices=["scanned", "unrolled"])
    p.add_argument("--t5-stacks", default="both",
                   choices=["both", "encoder", "decoder"],
                   help="which T5 stacks to scan (mirrors "
                        "T5Config.scan_layers; 'decoder' is the "
                        "throughput recipe)")
    p.add_argument("--vit", default="scan", choices=["scan", "keep"],
                   help="'keep' leaves the visual tower unrolled when "
                        "migrating --to scanned (matches configs with "
                        "TemporalViTConfig.scan_layers=False)")
    p.add_argument("--fuse", default="keep", choices=["keep", "fuse", "unfuse"],
                   help="attention projection packing: 'fuse' -> the "
                        "T5Config.fused_qkv layout, 'unfuse' -> separate "
                        "q/k/v params, 'keep' -> leave as stored")
    p.add_argument("--num-heads", type=int, default=12,
                   help="T5 num_heads (needed by --fuse fuse)")
    p.add_argument("--d-kv", type=int, default=64,
                   help="T5 d_kv (needed by --fuse fuse)")
    a = p.parse_args(args)

    import jax

    from vidchapters_tpu.runtime.checkpoint import CheckpointManager, _HAS_ORBAX

    src = Path(a.src)
    if not (src / a.name).exists():
        raise SystemExit(f"checkpoint not found: {src / a.name}")
    if not _HAS_ORBAX:
        # the flat-npz fallback cannot reconstruct nesting without a
        # template; orbax is present in all supported environments
        raise SystemExit("checkpoint migration needs orbax")
    import orbax.checkpoint as ocp

    raw = ocp.StandardCheckpointer().restore((src / a.name).absolute())
    params = raw[0] if isinstance(raw, (list, tuple)) else raw
    stacks = True if a.t5_stacks == "both" else a.t5_stacks
    migrated = migrate_params(params, a.to, t5_stacks=stacks,
                              vit=a.vit == "scan", fuse=a.fuse,
                              num_heads=a.num_heads, d_kv=a.d_kv)
    mgr = CheckpointManager(a.dst)
    mgr._save_tree(a.name, (migrated,),
                   {"layout": a.to, "migrated_from": str(src / a.name),
                    "t5_stacks": a.t5_stacks, "vit": a.vit, "fuse": a.fuse})
    n = sum(x.size for x in jax.tree_util.tree_leaves(migrated))
    print(f"wrote {a.dst}/{a.name} ({a.to}, {n} params)")


if __name__ == "__main__":
    main()
