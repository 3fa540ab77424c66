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
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
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
    # ephemeral free port: a fixed literal collides when two suites (or the
    # suite + scripts/multihost_sustained.py) run on the same box
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
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


# Multi-process full-state checkpoint + resume on the ToyEnv (the duck PPO
# path is identical; the toy keeps jit to seconds). Exercises exactly the
# branch single-process tests cannot: host0-decides + broadcast_one_to_all
# resume, process_allgather of the env-sharded batch, host0-only writes.
_RESUME_WORKER = textwrap.dedent("""
    import json, os, sys
    # 1 device per process BY DESIGN: in-process XLA:CPU collective
    # rendezvous can deadlock under oversubscription on a 1-core host
    # (see scripts/multihost_sustained.py docstring); the property under
    # test is the CROSS-process path, which 2x1 exercises fully
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=1"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=3600")
    sys.path.insert(0, os.getcwd())
    sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh
    from open_duck_playground_tpu.parallel import mesh as pmesh
    from open_duck_playground_tpu.train import ppo
    from open_duck_playground_tpu.utils.cache import setup_compilation_cache
    from test_resume import ToyEnv

    rank = int(os.environ["_MH_RANK"])
    pmesh.init_distributed(coordinator_address="127.0.0.1:%d",
                           num_processes=2, process_id=rank)
    assert jax.process_count() == 2 and jax.device_count() == 2
    setup_compilation_cache()
    mesh = Mesh(np.array(jax.devices()), ("env",))

    evals = []
    def progress(step, metrics):
        if "eval/episode_reward" in metrics:
            evals.append([int(step), float(metrics["eval/episode_reward"])])

    ckpt_dir = os.environ.get("_MH_CKPT") or None
    stop = os.environ.get("_MH_STOP") or None
    ppo.train(
        ToyEnv(), eval_env=ToyEnv(), mesh=mesh,
        num_timesteps=2048, episode_length=16, num_envs=8, num_eval_envs=4,
        unroll_length=4, num_minibatches=2, batch_size=4,
        num_updates_per_batch=1, num_evals=5, seed=7,
        network_factory={
            "policy_hidden_layer_sizes": (16,),
            "value_hidden_layer_sizes": (16,),
            "policy_obs_key": "state",
            "value_obs_key": "privileged_state",
        },
        progress_fn=progress,
        save_full_state_dir=ckpt_dir,
        auto_resume=ckpt_dir is not None,
        stop_after_epochs=int(stop) if stop else None,
        host_loop=True,
    )
    print("EVALS " + json.dumps({"rank": rank, "evals": evals}), flush=True)
""")


def _run_resume_stage(ckpt="", stop="", _retries=2):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    port = _free_port()
    procs = []
    for rank in range(2):
        e = dict(env, _MH_RANK=str(rank), _MH_CKPT=ckpt, _MH_STOP=stop)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _RESUME_WORKER % port], env=e, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=1800) for p in procs]
    evals = {}
    for rank, (p, (so, se)) in enumerate(zip(procs, outs)):
        if p.returncode and _retries and "bind" in (so + se).lower():
            # ephemeral-port TOCTOU: another process grabbed the port between
            # _free_port's close and the coordinator's bind — pick a new one
            return _run_resume_stage(ckpt=ckpt, stop=stop, _retries=_retries - 1)
        assert p.returncode == 0, f"rank {rank}\nstdout:{so}\nstderr:{se}"
        import json as _json

        row = next(l for l in so.splitlines() if l.startswith("EVALS "))
        evals[rank] = _json.loads(row[len("EVALS "):])["evals"]
    return evals


def _free_port():
    import socket

    with socket.socket() as s:
        # SO_REUSEADDR narrows (not closes) the window between our close and
        # the coordinator's bind; _run_resume_stage retries on a bind race
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@slow
def test_multiprocess_kill_and_resume_bit_reproduces_curve(tmp_path):
    ckpt = str(tmp_path / "mh_ckpt")
    # A: uninterrupted 2-process run
    full = _run_resume_stage()
    assert len(full[0]) == 5 and full[0] == full[1]
    # B: killed after 2 epochs (full state written by host0 via allgather)
    part = _run_resume_stage(ckpt=ckpt, stop="2")
    assert len(part[0]) == 3 and part[0] == part[1]
    assert os.path.isdir(ckpt)
    # C: auto-resume (host0 loads, state broadcast to all processes)
    rest = _run_resume_stage(ckpt=ckpt)
    assert len(rest[0]) == 2 and rest[0] == rest[1]
    merged = part[0] + rest[0]
    assert merged == full[0], f"{merged} != {full[0]}"
