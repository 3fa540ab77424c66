"""Device mesh / sharding helpers for env-parallel PPO.

The workload's scaling axis is the env batch (SURVEY.md section 2c): env
state is sharded along a 1-D "env" mesh axis, learner params replicated,
and XLA SPMD inserts gradient/statistics reductions over ICI. Multi-host
runs call `init_distributed()` first (jax.distributed), after which
`jax.devices()` spans the full slice and the same code scales out.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (no-op on a single host with no args)."""
    if coordinator_address is None and num_processes is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_env_mesh(devices=None) -> Mesh:
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, (ENV_AXIS,))


# Active env mesh registry: the fused Pallas step has no GSPMD partitioning
# rule, so ops/pallas_step.py wraps its pallas_call in shard_map over this
# mesh when one is registered (each chip runs its own 1024-env blocks).
# ppo.train registers its mesh here; single-chip runs leave it unset.
_ACTIVE_ENV_MESH: Optional[Mesh] = None


def set_env_mesh(mesh: Optional[Mesh]) -> None:
    global _ACTIVE_ENV_MESH
    _ACTIVE_ENV_MESH = mesh


def get_env_mesh() -> Optional[Mesh]:
    return _ACTIVE_ENV_MESH


def env_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
