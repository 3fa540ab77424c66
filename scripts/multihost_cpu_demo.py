"""Two-process CPU demo/check of the multi-host training path.

Launches 2 worker processes (4 virtual CPU devices each -> a global
8-device mesh over jax.distributed), runs one tiny ppo.train epoch with
the same global seeding as a single-host run, and prints a params
checksum per process. Because all RNG flows through globally-jitted SPMD
programs, the 2-process result must equal the 1-process 8-device result
(host-invariant seeding, SURVEY.md section 5.8).

Usage:  python scripts/multihost_cpu_demo.py          # orchestrates both
        (workers are spawned with _MH_RANK set)

Maps to: the reference's implicit brax pmap multi-device path
(reference common/runner.py:104-118); here scaled out across processes.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = int(os.environ.get("_MH_PORT", "56789"))


def worker(rank: int, nproc: int, nloc: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={nloc}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    from open_duck_playground_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=nproc,
        process_id=rank,
    )
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * nloc
    import numpy as np
    from jax.sharding import Mesh

    from open_duck_playground_tpu.envs import randomize
    from open_duck_playground_tpu.envs.joystick import Joystick
    from open_duck_playground_tpu.train import ppo

    env = Joystick(task="flat_terrain")
    mesh = Mesh(np.array(jax.devices()), ("env",))
    _, (normalizer, params), _ = ppo.train(
        env,
        eval_env=None,
        num_timesteps=32,
        episode_length=8,
        num_envs=16,
        unroll_length=2,
        num_minibatches=2,
        batch_size=8,
        num_updates_per_batch=1,
        num_evals=2,
        seed=0,
        mesh=mesh,
        randomization_fn=randomize.domain_randomize,
    )
    leaves = jax.tree_util.tree_leaves((normalizer, params))
    checksum = float(sum(np.abs(np.asarray(l, np.float64)).sum() for l in leaves))
    count = float(np.asarray(normalizer.count))
    print(f"[rank {rank}] normalizer.count={count} checksum={checksum:.6f}",
          flush=True)


def main() -> None:
    rank = os.environ.get("_MH_RANK")
    if rank is not None:
        worker(int(rank), int(os.environ["_MH_NPROC"]),
               int(os.environ["_MH_NLOC"]))
        return

    nproc, nloc = 2, 4
    procs = []
    for r in range(nproc):
        env = dict(os.environ)
        env.update(_MH_RANK=str(r), _MH_NPROC=str(nproc), _MH_NLOC=str(nloc))
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)], env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ))
    rc = [p.wait(timeout=1800) for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes: {rc}")
    print("multihost_cpu_demo OK (2 processes x 4 devices)")


if __name__ == "__main__":
    main()
