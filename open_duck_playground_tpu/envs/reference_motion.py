"""Polynomial-compressed reference gait library, TPU-resident.

The gait library (reference data/polynomial_coefficients.pkl, produced by
the external Open_Duck_reference_motion_generator) stores, for each command
grid point "dx_dy_dtheta" (6 x 4 x 10 grid), degree-15 polynomial
coefficients for each of 40 motion dimensions over one gait period
(period 0.54 s @ 50 fps -> 27 steps).

Frame layout (reference poly_reference_motion.py:6-51):
  [0:16]  joint positions (incl. neck/head/antennas)
  [16:32] joint velocities
  [32:34] foot contacts (left, right)
  [34:37] base linear velocity
  [37:40] base angular velocity

TPU-first design: the whole library is a single (6, 4, 10, 40, 16) device
constant; lookup = clip + nearest-grid argmin + gather; evaluation = Horner
on the MXU-friendly (40, 16) coefficient block. No host work per step.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np


class PolyReferenceMotion:
    def __init__(self, polynomial_coefficients: str):
        with open(polynomial_coefficients, "rb") as f:
            raw = pickle.load(f)

        dxs, dys, dthetas = set(), set(), set()
        meta = next(iter(raw.values()))
        self.period = meta["period"]
        self.fps = meta["fps"]
        self.frame_offsets = meta["frame_offsets"]
        self.startend_double_support_ratio = meta["startend_double_support_ratio"]
        self.start_offset = int(self.startend_double_support_ratio * self.fps)
        self.nb_steps_in_period = int(self.period * self.fps)

        entries = {}
        for name, entry in raw.items():
            dx, dy, dth = (float(x) for x in name.split("_"))
            dxs.add(dx)
            dys.add(dy)
            dthetas.add(dth)
            # store highest-degree-first for Horner evaluation
            coeffs = np.stack(
                [np.asarray(v)[::-1] for v in entry["coefficients"].values()]
            )
            entries[(dx, dy, dth)] = coeffs

        self.dxs = sorted(dxs)
        self.dys = sorted(dys)
        self.dthetas = sorted(dthetas)
        self.dx_range = [min(0.0, self.dxs[0]), max(0.0, self.dxs[-1])]
        self.dy_range = [min(0.0, self.dys[0]), max(0.0, self.dys[-1])]
        self.dtheta_range = [min(0.0, self.dthetas[0]), max(0.0, self.dthetas[-1])]

        grid = np.stack(
            [
                np.stack(
                    [
                        np.stack([entries[(dx, dy, dth)] for dth in self.dthetas])
                        for dy in self.dys
                    ]
                )
                for dx in self.dxs
            ]
        )  # (ndx, ndy, ndth, 40, deg+1)
        self.data_array = jnp.asarray(grid, jnp.float32)
        self._dx_grid = jnp.asarray(self.dxs, jnp.float32)
        self._dy_grid = jnp.asarray(self.dys, jnp.float32)
        self._dth_grid = jnp.asarray(self.dthetas, jnp.float32)
        self.nb_dims = grid.shape[3]

    def vel_to_index(self, dx, dy, dtheta):
        """Nearest grid indices (argmin over |grid - cmd|, ties -> first)."""
        dx = jnp.clip(dx, self.dx_range[0], self.dx_range[1])
        dy = jnp.clip(dy, self.dy_range[0], self.dy_range[1])
        dtheta = jnp.clip(dtheta, self.dtheta_range[0], self.dtheta_range[1])
        ix = jnp.argmin(jnp.abs(self._dx_grid - dx))
        iy = jnp.argmin(jnp.abs(self._dy_grid - dy))
        ith = jnp.argmin(jnp.abs(self._dth_grid - dtheta))
        return ix, iy, ith

    def get_reference_motion(self, dx, dy, dtheta, i) -> jax.Array:
        """40-dim reference frame for command (dx, dy, dtheta) at step i."""
        ix, iy, ith = self.vel_to_index(dx, dy, dtheta)
        coeffs = self.data_array[ix, iy, ith]  # (40, deg+1)
        t = (i % self.nb_steps_in_period) / self.nb_steps_in_period
        t = jnp.clip(t, 0.0, 1.0).astype(coeffs.dtype)
        # Horner over the coefficient columns (highest degree first)
        out = coeffs[:, 0]
        for k in range(1, coeffs.shape[1]):
            out = out * t + coeffs[:, k]
        return out
