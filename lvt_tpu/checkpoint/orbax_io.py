"""Checkpoint save/resume on Orbax (reference: fvcore Checkpointer with
netE/netG/netC subdirectories, meta_arch/ae.py:231-238, engine/defaults.py:175-191).

One Orbax checkpoint per step holds the full training tree (params, model
state, optimizer state, step). The netE/netG/netC split lives *inside* the
tree, so per-subnet pretrained weights can still be grafted independently.

Reference bug NOT replicated: resume restores the iteration counter (the
reference comments that restore out and always restarts at iter 0,
defaults.py:186-191).
"""

import logging
import os
import re
from typing import Any, Optional

import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)

_CKPT_DIR = "checkpoints"
_CKPT_PREFIX = "ckpt_"


def checkpoint_dir(output_dir: str) -> str:
    return os.path.join(os.path.abspath(output_dir), _CKPT_DIR)


def save_checkpoint(output_dir: str, step: int, tree: Any) -> str:
    path = os.path.join(checkpoint_dir(output_dir), f"{_CKPT_PREFIX}{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    logger.info(f"Saved checkpoint to {path}")
    return path


def _checkpoint_steps(output_dir: str):
    """Sorted [(step, name)] of checkpoints under output_dir — the single
    owner of the naming scheme for latest_checkpoint AND prune_checkpoints."""
    d = checkpoint_dir(output_dir)
    if not os.path.isdir(d):
        return []
    entries = []
    for name in os.listdir(d):
        m = re.fullmatch(rf"{_CKPT_PREFIX}(\d+)", name)
        if m:
            entries.append((int(m.group(1)), name))
    entries.sort()
    return entries


def latest_checkpoint(output_dir: str) -> Optional[str]:
    entries = _checkpoint_steps(output_dir)
    if not entries:
        return None
    return os.path.join(checkpoint_dir(output_dir), entries[-1][1])


def _restore_args_for(target: Any):
    """Explicit per-leaf restore args carrying each target leaf's sharding.

    When the target tree holds mesh-placed jax.Arrays (GSPMD training
    state), Orbax must be told the destination shardings explicitly —
    restoring without them falls back to the checkpoint's RECORDED device
    layout, which Orbax itself warns is "unsafe when restoring on a
    different topology than the checkpoint was saved with". With explicit
    shardings the restore is topology-change-safe: values land directly on
    the current mesh regardless of the mesh they were saved under
    (tests/test_checkpoint_sharded.py)."""
    import jax

    if not any(isinstance(leaf, jax.Array)
               for leaf in jax.tree_util.tree_leaves(target)):
        return None
    return ocp.checkpoint_utils.construct_restore_args(target)


def load_checkpoint(path: str, target: Any, *, partial: bool = False) -> Any:
    """Restore a checkpoint into the structure of ``target``; partial=True
    restores only the keys present in target (e.g. params without
    optimizer state for eval-only loads). Target leaves that are
    jax.Arrays are restored WITH their shardings (see _restore_args_for)."""
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(
            path, ocp.args.PyTreeRestore(
                item=target, restore_args=_restore_args_for(target),
                partial_restore=partial))


def resume_or_load(output_dir: str, target: Any, *, resume: bool = True) -> Any:
    """Restore the latest checkpoint under output_dir if present; else
    return target unchanged (pretrained grafting happens upstream)."""
    if resume:
        path = latest_checkpoint(output_dir)
        if path is not None:
            logger.info(f"Resuming from {path}")
            return load_checkpoint(path, target)
    return target


def prune_checkpoints(output_dir: str, keep: int = 2) -> None:
    """Remove all but the newest ``keep`` checkpoints."""
    import shutil

    entries = _checkpoint_steps(output_dir)
    d = checkpoint_dir(output_dir)
    for _, name in entries[:-keep] if keep > 0 else entries:
        shutil.rmtree(os.path.join(d, name), ignore_errors=True)
