"""Checkpoint management: best / last / periodic, via orbax.

Mirrors the reference policy set (SURVEY.md §5): Vid2Seq keeps a rolling
``ckpt`` plus a best-by-metric copy (dvc.py:402-441); Moment-DETR keeps
``_best``/``_latest``/periodic epoch copies (moment_detr train.py:160-208);
PDVC persists histories for exact resume (PDVC/train.py:264-347). One manager
covers all three, storing {params, opt_state, step/epoch, metadata-json}.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    def __init__(self, save_dir: str, best_metric: str = "CIDEr",
                 best_mode: str = "max", save_every_epochs: int = 0,
                 keep_last: int = 1, keep_best: int = 1):
        """``keep_last`` / ``keep_best`` > 1 additionally archive
        ``last_e{epoch}`` / ``best_e{epoch}`` copies, pruning the oldest so
        at most that many exist (the ``last`` / ``best`` aliases always hold
        the newest and count toward the quota). Matches the reference's
        rolling-copy policies (dvc.py:402-441 keeps one of each;
        moment_detr train.py:160-208 keeps best/latest/periodic)."""
        self.dir = Path(save_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.best_metric = best_metric
        self.best_mode = best_mode
        self.save_every_epochs = save_every_epochs
        self.keep_last = max(1, keep_last)
        self.keep_best = max(1, keep_best)
        self.best_value: Optional[float] = None
        self._load_state()

    # -- metadata ------------------------------------------------------------

    @property
    def _meta_path(self) -> Path:
        return self.dir / "manager.json"

    def _load_state(self) -> None:
        if self._meta_path.exists():
            meta = json.loads(self._meta_path.read_text())
            self.best_value = meta.get("best_value")

    def _save_state(self) -> None:
        self._meta_path.write_text(json.dumps({"best_value": self.best_value}))

    # -- save/restore --------------------------------------------------------

    def _save_tree(self, name: str, tree: Any, meta: Dict[str, Any]) -> None:
        path = self.dir / name
        multiproc = jax.process_count() > 1
        main = jax.process_index() == 0
        if _HAS_ORBAX:
            ckptr = ocp.StandardCheckpointer()
            tmp = self.dir / (name + ".tmp")
            if main and tmp.exists():
                import shutil

                shutil.rmtree(tmp)
            if multiproc:  # all hosts wait for the cleanup, then co-save
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(f"ckpt_clean_{name}")
            ckptr.save(tmp.absolute(), tree)
            ckptr.wait_until_finished()
            if multiproc:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(f"ckpt_saved_{name}")
            if main:  # single filesystem mutator for the atomic swap
                if path.exists():
                    import shutil

                    shutil.rmtree(path)
                os.rename(tmp, path)
            if multiproc:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(f"ckpt_swap_{name}")
        elif main:  # flat-npz fallback
            flat = jax.tree_util.tree_flatten_with_path(tree)[0]
            arrays = {"/".join(str(k) for k in kp): np.asarray(v)
                      for kp, v in flat}
            np.savez(str(path) + ".npz", **arrays)
        if main:
            (self.dir / (name + ".meta.json")).write_text(json.dumps(meta))
        if multiproc:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_meta_{name}")

    def _restore_tree(self, name: str, target: Any) -> Any:
        path = self.dir / name
        if _HAS_ORBAX and path.exists():
            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(path.absolute(), target)
        npz = Path(str(path) + ".npz")
        if npz.exists():
            data = np.load(npz)
            leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
            restored = [data["/".join(str(k) for k in kp)] for kp, _ in leaves]
            return jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(target), restored)
        raise FileNotFoundError(path)

    def meta(self, name: str) -> Dict[str, Any]:
        p = self.dir / (name + ".meta.json")
        return json.loads(p.read_text()) if p.exists() else {}

    def _prune_archives(self, prefix: str, keep: int) -> None:
        """Drop the oldest ``{prefix}_e{epoch}`` archives beyond ``keep``."""
        if jax.process_index() != 0:
            return
        import re
        import shutil

        found = []  # (epoch, path)
        for p in self.dir.iterdir():
            m = re.fullmatch(rf"{prefix}_e(\d+)(\.npz)?", p.name)
            if m:
                found.append((int(m.group(1)), p))
        for _, p in sorted(found)[:max(0, len(found) - keep)]:
            shutil.rmtree(p) if p.is_dir() else p.unlink()
            meta = self.dir / (p.name.replace(".npz", "") + ".meta.json")
            if meta.exists():
                meta.unlink()

    def save_last(self, tree: Any, epoch: int, extra: Optional[dict] = None) -> None:
        self._save_tree("last", tree, {"epoch": epoch, **(extra or {})})
        if self.keep_last > 1:
            self._save_tree(f"last_e{epoch}", tree, {"epoch": epoch})
            self._prune_archives("last", self.keep_last - 1)
        if self.save_every_epochs and (epoch + 1) % self.save_every_epochs == 0:
            self._save_tree(f"epoch_{epoch}", tree, {"epoch": epoch})

    def maybe_save_best(self, tree: Any, epoch: int,
                        metrics: Dict[str, float]) -> bool:
        value = metrics.get(self.best_metric)
        if value is None:
            return False
        better = (self.best_value is None
                  or (self.best_mode == "max" and value > self.best_value)
                  or (self.best_mode == "min" and value < self.best_value))
        if better:
            self.best_value = float(value)
            self._save_tree("best", tree,
                            {"epoch": epoch, self.best_metric: float(value)})
            if self.keep_best > 1:
                self._save_tree(f"best_e{epoch}", tree,
                                {"epoch": epoch,
                                 self.best_metric: float(value)})
                self._prune_archives("best", self.keep_best - 1)
            self._save_state()
        return better

    def restore(self, name: str, target: Any) -> Any:
        return self._restore_tree(name, target)

    def restore_params(self, name: str, params_template: Any) -> Any:
        """Restore only the leading params tree of a saved tuple.

        Works against checkpoints saved as ``(params,)`` (vc/grounding
        mains) and full ``(params, opt_state, step)`` train states
        (dvc_main) — serving / transfer only needs the parameters.
        """
        try:
            (params,) = self._restore_tree(name, (params_template,))
            return params
        except Exception:
            if not _HAS_ORBAX:
                raise
        raw = ocp.StandardCheckpointer().restore((self.dir / name).absolute())
        first = raw[0] if isinstance(raw, (list, tuple)) else raw
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(params_template),
            jax.tree_util.tree_leaves(first))

    def has(self, name: str) -> bool:
        return (self.dir / name).exists() or Path(str(self.dir / name) + ".npz").exists()
