"""Orbax checkpointing of (normalizer, network params).

Parity with the reference's policy_params_fn checkpoints (reference
common/runner.py:68-76): a PyTree save per eval step at
"{output_dir}/{datetime}_{step}", restored via --restore_checkpoint_path.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save(path: str, params: Any) -> None:
    from orbax import checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(os.path.abspath(path), params, force=True)


def load(path: str, target: Any) -> Any:
    from orbax import checkpoint as ocp

    checkpointer = ocp.PyTreeCheckpointer()
    restored = checkpointer.restore(os.path.abspath(path), item=target)
    return jax.tree_util.tree_map(lambda t, r: jax.numpy.asarray(r, t.dtype) if hasattr(t, 'dtype') else r, target, restored)
