"""Multi-host equality check, wired as a pytest (VERDICT r2 #5).

Runs scripts/multihost_cpu_demo.py, which spawns a 1-process 8-device
reference plus a 2-process jax.distributed run of the same tiny
ppo.train config and exits nonzero unless rank0 == rank1 exactly and
the 2-process result reproduces the 1-process stream. RUN_SLOW because
it pays three subprocess jit warmups (~minutes on this CPU).
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

slow = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="3 subprocess jit warmups; set RUN_SLOW=1",
)

# Trimmed default-suite variant (VERDICT r3 #3): exercises the REAL
# multi-host plumbing — jax.distributed init over localhost, a global mesh
# spanning both processes, make_array_from_process_local_data placement,
# and a cross-process collective — but compiles only a psum-sized program,
# so it runs in seconds where the PPO variants below pay minutes of jit.
_SMOKE_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.getcwd())
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from open_duck_playground_tpu.parallel import mesh as pmesh

    rank = int(os.environ["_MH_RANK"])
    pmesh.init_distributed(coordinator_address="127.0.0.1:%d",
                           num_processes=2, process_id=rank)
    assert jax.process_count() == 2 and jax.device_count() == 4
    mesh = pmesh.make_env_mesh()
    # process-local shard: rank r holds [4r, 4r+1, 4r+2, 4r+3]
    local = np.arange(4 * rank, 4 * rank + 4, dtype=np.float32).reshape(4, 1)
    garr = jax.make_array_from_process_local_data(
        pmesh.env_sharding(mesh), local, (8, 1))

    @jax.jit
    def total(x):
        f = shard_map(lambda s: jax.lax.psum(s.sum(), pmesh.ENV_AXIS),
                      mesh=mesh, in_specs=P(pmesh.ENV_AXIS), out_specs=P())
        return f(x)

    t = float(total(garr))
    assert t == float(np.arange(8).sum()), t
    print(f"SMOKE_OK rank={rank} total={t}", flush=True)
""")


def test_multihost_smoke_two_process():
    """2-process jax.distributed + global-mesh collective, default suite."""
    port = 56913
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    procs = []
    for rank in range(2):
        e = dict(env, _MH_RANK=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _SMOKE_WORKER % port], env=e, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for rank, (p, (so, se)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank}\nstdout:{so}\nstderr:{se}"
        assert f"SMOKE_OK rank={rank} total=28.0" in so


@slow
def test_multihost_two_process_equality():
    env = dict(os.environ, _MH_PORT="56891")
    env.pop("JAX_PLATFORMS", None)  # workers force CPU themselves
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_cpu_demo.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "multihost_cpu_demo OK" in out.stdout
