"""Multi-host equality CHECK of the training path (2 CPU processes).

Runs the same tiny ppo.train epoch three ways and ASSERTS the results
match (VERDICT r2 #5 — the old demo printed checksums without comparing):

  reference: 1 process x 8 virtual CPU devices
  rank 0/1:  2 processes x 4 devices each over jax.distributed

Because all RNG flows through globally-jitted SPMD programs over the
full mesh, host-invariant seeding demands rank0 == rank1 EXACTLY
(replicated outputs of one global program) and 2-process == 1-process up
to collective reassociation (rtol 1e-5; normalizer.count exact). Any
drift in seeding or psum semantics makes this script exit nonzero.

Usage:  python scripts/multihost_cpu_demo.py          # orchestrates all 3
        (workers are spawned with _MH_RANK set)
Also wired as a RUN_SLOW pytest (tests/test_multihost.py).

Maps to: the reference's implicit brax pmap multi-device path
(reference common/runner.py:104-118); here scaled out across processes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = int(os.environ.get("_MH_PORT", "56789"))


def worker(rank: int, nproc: int, nloc: int, out_path: str) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={nloc}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    if nproc > 1:
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
    result = {
        "rank": rank,
        "nproc": nproc,
        "count": float(np.asarray(normalizer.count)),
        "abs_sum": float(
            sum(np.abs(np.asarray(l, np.float64)).sum() for l in leaves)
        ),
        "sq_sum": float(
            sum((np.asarray(l, np.float64) ** 2).sum() for l in leaves)
        ),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"[{nproc}proc rank {rank}] {result}", flush=True)


def _spawn(rank: int, nproc: int, nloc: int, out_path: str):
    env = dict(os.environ)
    env.update(_MH_RANK=str(rank), _MH_NPROC=str(nproc), _MH_NLOC=str(nloc),
               _MH_OUT=out_path)
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)], env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )


def main() -> None:
    rank = os.environ.get("_MH_RANK")
    if rank is not None:
        worker(int(rank), int(os.environ["_MH_NPROC"]),
               int(os.environ["_MH_NLOC"]), os.environ["_MH_OUT"])
        return

    import numpy as np

    tmp = tempfile.mkdtemp(prefix="mh_demo_")
    paths = {
        "ref": os.path.join(tmp, "ref.json"),
        "r0": os.path.join(tmp, "r0.json"),
        "r1": os.path.join(tmp, "r1.json"),
    }

    # 1-process 8-device reference
    p = _spawn(0, 1, 8, paths["ref"])
    if p.wait(timeout=1800):
        raise SystemExit("reference (1-process) worker failed")
    # 2-process 4+4 device run
    procs = [_spawn(r, 2, 4, paths[f"r{r}"]) for r in range(2)]
    rc = [p.wait(timeout=1800) for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes: {rc}")

    ref, r0, r1 = (json.load(open(paths[k])) for k in ("ref", "r0", "r1"))

    # ranks of ONE distributed run see the same replicated result: exact
    for key in ("count", "abs_sum", "sq_sum"):
        if r0[key] != r1[key]:
            raise SystemExit(
                f"CROSS-RANK MISMATCH on {key}: rank0={r0[key]!r} "
                f"rank1={r1[key]!r}"
            )
    # 2-process must reproduce the 1-process stream (collective
    # reassociation tolerance on float accumulations; count exact)
    if r0["count"] != ref["count"]:
        raise SystemExit(
            f"NORMALIZER COUNT MISMATCH: 2proc={r0['count']} 1proc={ref['count']}"
        )
    for key in ("abs_sum", "sq_sum"):
        if not np.isclose(r0[key], ref[key], rtol=1e-5, atol=0.0):
            raise SystemExit(
                f"1-vs-2-PROCESS MISMATCH on {key}: 2proc={r0[key]!r} "
                f"1proc={ref[key]!r}"
            )
    print(
        "multihost_cpu_demo OK: rank0==rank1 exactly; 2-process matches "
        f"1-process 8-device run (count={ref['count']}, "
        f"abs_sum={ref['abs_sum']:.6f})"
    )


if __name__ == "__main__":
    main()
