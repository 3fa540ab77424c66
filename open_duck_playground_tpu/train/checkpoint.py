"""Orbax checkpointing.

Two granularities:

- `save`/`load`: (normalizer, params) PyTree per eval step, parity with the
  reference's policy_params_fn checkpoints (reference common/runner.py:68-76),
  restored via --restore_checkpoint_path.

- `save_full`/`load_full`/`latest_full`: the complete training state —
  TrainingState (params, normalizer, optimizer state, env_steps), the env
  state batch, and the host RNG keys — so a killed run resumes with the
  exact eval curve of the uninterrupted run (the reference stack cannot do
  this: brax checkpoints params only). Saved per epoch under
  `<dir>/full_<epoch>` with rotation (default keep 2).
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, List, Optional, Tuple

import jax


def _checkpointer():
    from orbax import checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save(path: str, params: Any) -> None:
    _checkpointer().save(os.path.abspath(path), params, force=True)


def load(path: str, target: Any) -> Any:
    restored = _checkpointer().restore(os.path.abspath(path), item=target)
    return jax.tree_util.tree_map(
        lambda t, r: jax.numpy.asarray(r, t.dtype) if hasattr(t, "dtype") else r,
        target, restored,
    )


# ---------------------------------------------------------------------------
# full-state checkpoints (curve-preserving resume)
# ---------------------------------------------------------------------------

_FULL_RE = re.compile(r"^full_(\d+)$")


def full_path(directory: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(directory), f"full_{epoch:05d}")


def save_full(directory: str, epoch: int, state: Any, keep: int = 2) -> str:
    """Save the full train state for `epoch`; prune to the newest `keep`."""
    path = full_path(directory, epoch)
    _checkpointer().save(path, state, force=True)
    for old_epoch, old_path in list_full(directory)[:-keep]:
        del old_epoch
        shutil.rmtree(old_path, ignore_errors=True)
    return path


def list_full(directory: str) -> List[Tuple[int, str]]:
    """(epoch, path) of complete full-state checkpoints, oldest first."""
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return []
    out = []
    for name in os.listdir(directory):
        m = _FULL_RE.match(name)
        path = os.path.join(directory, name)
        if m and os.path.isdir(path):
            out.append((int(m.group(1)), path))
    return sorted(out)


def latest_full(directory: str) -> Optional[Tuple[int, str]]:
    entries = list_full(directory)
    return entries[-1] if entries else None


def load_full(path: str, target: Any) -> Any:
    return load(path, target)
