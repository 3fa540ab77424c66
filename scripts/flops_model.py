"""Analytic FLOPs/bytes per physics substep from the pure-XLA pipeline.

The fused Mosaic kernel is opaque to XLA's cost model (custom-call flops
are not counted), so mfu_roofline.py's TPU cost analysis undercounts
compute. The MATH per substep is identical in the pure-XLA pipeline
(ops/forward.step), whose HLO the cost model can see — so compile a
vmapped single substep on CPU and report flops / env / substep. Combined
with the measured fused-kernel wall time this yields the effective
FLOP/s the RESULTS.md roofline section quotes.

Bytes here are the UNFUSED pipeline's logical traffic (every intermediate
hits memory) — an upper bound; the fused kernel keeps intermediates in
VMEM and its true HBM traffic is the state in/out + constants, which the
TPU-side cost analysis does capture (operands of the custom call).

Usage: python scripts/flops_model.py [--task flat_terrain] [--envs 128]
Artifact: prints one JSON line; r5 chain saves to RESULTS/r5/.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="flat_terrain")
    ap.add_argument("--envs", type=int, default=128)
    args = ap.parse_args()

    from open_duck_playground_tpu.mjcf.compiler import compile_mjcf
    from open_duck_playground_tpu.models.open_duck_mini_v2 import constants
    from open_duck_playground_tpu.ops import forward as fwd
    from open_duck_playground_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    m = compile_mjcf(constants.task_to_xml(args.task), timestep=0.002)
    kf = m.keyframe("home")
    d = fwd.make_data(m)
    d = d.replace(qpos=jnp.asarray(kf.qpos, jnp.float32),
                  ctrl=jnp.asarray(kf.ctrl, jnp.float32))
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (args.envs,) + x.shape), d)

    step1 = jax.jit(jax.vmap(lambda dd: fwd.step(m, dd)))
    compiled = step1.lower(batch).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    byt = float(ca.get("bytes accessed", 0.0))
    out = {
        "task": args.task,
        "envs": args.envs,
        "nv": int(m.nv), "nq": int(m.nq), "nu": int(m.nu),
        "flops_per_env_substep": round(flops / args.envs, 1),
        "unfused_bytes_per_env_substep": round(byt / args.envs, 1),
        "note": "pure-XLA pipeline HLO cost; same math as the fused kernel",
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
