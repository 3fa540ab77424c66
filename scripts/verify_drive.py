"""End-to-end verify drive (.claude/skills/verify recipe): zero-action
stand, random-action fall, NaN probe — the library surface a user hits."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from open_duck_playground_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()
import jax.numpy as jnp

from open_duck_playground_tpu.envs.joystick import Joystick

env = Joystick(task="flat_terrain")
st = jax.jit(env.reset)(jax.random.PRNGKey(0))
step = jax.jit(env.step)
for i in range(50):
    st = step(st, jnp.zeros(env.action_size))
z = float(st.data.qpos[2])
print("zero-action: base z", round(z, 3), "done", int(st.done),
      "reward", float(st.reward), flush=True)
assert 0.1 < z < 0.25 and int(st.done) == 0
st = jax.jit(env.reset)(jax.random.PRNGKey(1))
key = jax.random.PRNGKey(2)
fell = False
for i in range(200):
    key, k = jax.random.split(key)
    a = jax.random.uniform(k, (env.action_size,), minval=-1.0, maxval=1.0)
    st = step(st, a)
    assert jnp.isfinite(st.reward), i
    if int(st.done):
        fell = True
        break
print("random-action: fell =", fell, "at step", i, flush=True)
st = jax.jit(env.reset)(jax.random.PRNGKey(3))
for i in range(3):
    st = step(st, jnp.full((env.action_size,), jnp.nan))
    if int(st.done):
        break
print("NaN probe: done after", i + 1, "steps")
assert int(st.done) == 1
print("VERIFY env drive: OK")
