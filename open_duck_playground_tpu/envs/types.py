"""Environment State pytree (parity with mujoco_playground mjx_env.State)."""

from __future__ import annotations

from typing import Any, Dict

import jax
from flax import struct

from open_duck_playground_tpu.ops.types import Data

Observation = Dict[str, jax.Array]


@struct.dataclass
class State:
    """Env state carried through rollout scans.

    Mirrors the reference's `mjx_env.State(data, obs, reward, done, metrics,
    info)` contract consumed by the PPO wrapper stack.
    """

    data: Data
    obs: Observation
    reward: jax.Array
    done: jax.Array
    metrics: Dict[str, jax.Array]
    info: Dict[str, Any]
