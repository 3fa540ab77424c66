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
_FULL_NPZ_RE = re.compile(r"^full_(\d+)\.npz$")


def full_path(directory: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(directory), f"full_{epoch:05d}")


def save_full(directory: str, epoch: int, state: Any, keep: int = 2) -> str:
    """Save the full train state for `epoch`; prune to the newest `keep`.

    Single-file .npz, written atomically (tmp + rename): orbax writes one
    file per leaf, which measured 16 s/epoch at 8192 envs on the TPU
    tunnel (60% of a 27 s epoch — VERDICT r4 #6); one flat npz write of
    the same state is sub-second. Leaves are stored by flatten order;
    `load_full` restores against the caller's target treedef (the same
    contract orbax had). Legacy orbax directories remain loadable.
    """
    import numpy as np

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    path = full_path(directory, epoch) + ".npz"
    leaves = jax.tree_util.tree_leaves(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **{f"leaf_{i:04d}": np.asarray(l)
                       for i, l in enumerate(leaves)})
    os.replace(tmp, path)
    for old_epoch, old_path in list_full(directory)[:-keep]:
        del old_epoch
        if os.path.isdir(old_path):
            shutil.rmtree(old_path, ignore_errors=True)
        else:
            try:
                os.remove(old_path)
            except OSError:
                pass
    return path


def list_full(directory: str) -> List[Tuple[int, str]]:
    """(epoch, path) of complete full-state checkpoints, oldest first."""
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return []
    out = []
    for name in os.listdir(directory):
        path = os.path.join(directory, name)
        m = _FULL_NPZ_RE.match(name)
        if m and os.path.isfile(path):
            out.append((int(m.group(1)), path))
            continue
        m = _FULL_RE.match(name)
        if m and os.path.isdir(path):  # legacy orbax layout
            out.append((int(m.group(1)), path))
    return sorted(out)


def latest_full(directory: str) -> Optional[Tuple[int, str]]:
    entries = list_full(directory)
    return entries[-1] if entries else None


def load_full(path: str, target: Any) -> Any:
    if not str(path).endswith(".npz") and os.path.isfile(str(path) + ".npz"):
        path = str(path) + ".npz"
    if str(path).endswith(".npz"):
        import numpy as np

        with np.load(path) as z:
            leaves = [z[f"leaf_{i:04d}"] for i in range(len(z.files))]
        t_leaves, treedef = jax.tree_util.tree_flatten(target)
        assert len(leaves) == len(t_leaves), (len(leaves), len(t_leaves))
        leaves = [np.asarray(l, getattr(t, "dtype", l.dtype))
                  for l, t in zip(leaves, t_leaves)]
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return load(path, target)  # legacy orbax directory
