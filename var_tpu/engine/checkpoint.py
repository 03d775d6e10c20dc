"""Checkpoint save / auto-resume.

Replaces the reference's single ``ar-ckpt-last.pth`` torch.save flow
(``train.py:218-231``, ``trainer.py:169-201``, ``utils/misc.py:344-357``)
with orbax: asynchronous-capable, sharding-aware PyTree checkpoints of
{params, opt_state, step, epoch, iter, args}. ``auto_resume`` picks the
newest ``ar-ckpt-*`` directory, so operator-driven restart recovery works
exactly like the reference (README.md:149).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


def _ckptr() -> ocp.Checkpointer:
    return ocp.Checkpointer(ocp.StandardCheckpointHandler())  # synchronous


def save_checkpoint(path: str, state: Any, meta: Optional[dict] = None) -> None:
    """Write a checkpoint directory at ``path`` (overwrites).

    Multi-host: every process must call this (orbax coordinates the
    distributed array write); filesystem renames and the meta sidecar are
    master-only, fenced by barriers (reference: local-master torch.save +
    barrier, train.py:218-231).
    """
    import jax

    path = os.path.abspath(path)
    master = jax.process_index() == 0

    def _barrier(tag):
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_{tag}_{os.path.basename(path)}")

    if os.path.exists(path):
        # orbax refuses to overwrite; stage to tmp then swap like the
        # reference's atomic-ish last-ckpt replacement (train.py:222-227)
        import shutil

        tmp = path + ".tmp_new"
        if master and os.path.exists(tmp):
            shutil.rmtree(tmp)
        _barrier("pre")
        _ckptr().save(tmp, state)
        _barrier("saved")
        if master:
            old = path + ".tmp_old"
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old)
        _barrier("swapped")
    else:
        _ckptr().save(path, state)
        _barrier("saved_new")
    if meta is not None and master:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, default=str)
    _barrier("meta")


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure/shardings of ``target``."""
    return _ckptr().restore(os.path.abspath(path), args=ocp.args.StandardRestore(target))


def load_meta(path: str) -> dict:
    p = path + ".meta.json"
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def auto_resume(out_dir: str, pattern: str = "ar-ckpt*") -> Tuple[Optional[str], dict]:
    """Newest matching checkpoint dir (or None) + its meta
    (reference ``misc.glob_with_latest_modified_first`` + ``auto_resume``)."""
    cands = [p for p in glob.glob(os.path.join(out_dir, pattern)) if os.path.isdir(p)]
    cands = [p for p in cands
             if not p.endswith((".tmp_new", ".tmp_old")) and "checkpoint-tmp" not in p]
    if not cands:
        return None, {}
    newest = max(cands, key=os.path.getmtime)
    return newest, load_meta(newest)
