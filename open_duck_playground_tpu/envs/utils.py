"""Small env utilities (parity with reference common/utils.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class LowPassActionFilter:
    """First-order low-pass filter on actions.

    Parity note: the reference ships this but keeps every call site
    commented out (joystick.py:202-204,378-379; mujoco_infer.py:205-206);
    it is provided for the same opt-in experimentation.
    """

    def __init__(self, control_freq: float, cutoff_frequency: float = 30.0):
        self.last_action = 0
        self.current_action = 0
        self.control_freq = float(control_freq)
        self.cutoff_frequency = float(cutoff_frequency)
        self.alpha = self.compute_alpha()

    def compute_alpha(self) -> float:
        return (1.0 / self.cutoff_frequency) / (
            1.0 / self.control_freq + 1.0 / self.cutoff_frequency
        )

    def push(self, action: jax.Array) -> None:
        self.current_action = jnp.array(action)

    def get_filtered_action(self) -> jax.Array:
        self.last_action = (
            self.alpha * self.last_action + (1 - self.alpha) * self.current_action
        )
        return self.last_action
