"""Command-conditioned gait-clock law, dependency-light.

This module is intentionally jax-free at import time so the 50 Hz deploy
loop (deploy/policy_loop.py) can use the SAME law as training without
paying the jax/ops import on its first control tick, and so deploy targets
without jax installed keep working. Training (envs/joystick.py) imports the
same function; when handed a jnp tracer it dispatches to jax.numpy, which
is already imported in that context.

The constants (vx_ref, f_max) are trained in and shipped via ONNX
`metadata_props` (export/export.py) so both sides run one law.
"""

from __future__ import annotations

import numpy as np


def phase_frequency_from_command(cmd_vx, vx_ref: float, f_max: float):
    """Command-conditioned gait-clock factor: clip(|vx| / vx_ref, 1, f_max).

    vx_ref <= 0 disables the law (factor 1.0 — reference parity). Works on
    jnp tracers (training) and numpy scalars (deploy twin); deploy reads the
    same constants back from ONNX metadata so both sides run one law.
    """
    if type(cmd_vx).__module__.split(".")[0] == "jax" or "Tracer" in type(cmd_vx).__name__:
        import jax.numpy as xp  # already imported in any context that traces
    else:
        xp = np
    if vx_ref <= 0.0:
        return xp.float32(1.0)
    return xp.clip(xp.abs(cmd_vx) / vx_ref, 1.0, f_max).astype(xp.float32)
