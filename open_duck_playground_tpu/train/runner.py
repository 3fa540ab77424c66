"""Training runner CLI (parity with reference open_duck_mini_v2/runner.py +
common/runner.py): picks the env (joystick/standing) and task, wires domain
randomization, trains PPO with TensorBoard logging, checkpoints + ONNX
export at every eval.

Usage:
    python -m open_duck_playground_tpu.train.runner \
        --env joystick --task flat_terrain --num_timesteps 150000000 \
        --output_dir checkpoints [--restore_checkpoint_path P] \
        [--num_envs 8192] [--no_domain_randomization]
"""

from __future__ import annotations

import argparse
import functools
import os
from datetime import datetime
from pathlib import Path

from open_duck_playground_tpu.envs import joystick, randomize, standing
from open_duck_playground_tpu.train import checkpoint as ckpt
from open_duck_playground_tpu.train import ppo
from open_duck_playground_tpu.train.config import brax_ppo_config
from open_duck_playground_tpu.utils.cache import setup_compilation_cache


class BaseRunner:
    """Train orchestration: TB writer, PPO recipe, progress/ckpt callbacks."""

    def __init__(self, args: argparse.Namespace) -> None:
        import jax

        self.args = args
        self.is_host0 = jax.process_index() == 0
        self.output_dir = Path.cwd() / Path(args.output_dir)
        if self.is_host0:
            self.output_dir.mkdir(parents=True, exist_ok=True)
        setup_compilation_cache()

        from tensorboardX import SummaryWriter

        # host-side outputs (TB, checkpoints, ONNX) only on process 0;
        # device work is global-SPMD so every process runs the same program
        self.writer = (
            SummaryWriter(log_dir=str(self.output_dir)) if self.is_host0
            else None
        )
        self.env = None
        self.eval_env = None
        self.randomizer = None
        self.action_size = None
        self.obs_size = None
        self.num_timesteps = args.num_timesteps
        self.restore_checkpoint_path = None

    def progress_callback(self, num_steps: int, metrics: dict) -> None:
        if not self.is_host0:
            return
        for name, value in metrics.items():
            self.writer.add_scalar(name, value, num_steps)
        print("-----------")
        reward = metrics.get("eval/episode_reward", float("nan"))
        reward_std = metrics.get("eval/episode_reward_std", float("nan"))
        print(f"STEP: {num_steps} reward: {reward} reward_std: {reward_std}")
        if "training/sps" in metrics:
            print(f"  env-steps/s: {metrics['training/sps']:.0f}")
        print("-----------", flush=True)

    def policy_params_fn(self, current_step, make_policy, params):
        del make_policy
        if not self.is_host0:
            return
        d = datetime.now().strftime("%Y_%m_%d_%H%M%S")
        path = f"{self.output_dir}/{d}_{current_step}"
        print(f"Saving checkpoint (step: {current_step}): {path}")
        ckpt.save(path, params)
        if not self.args.skip_onnx_export:
            from open_duck_playground_tpu.export.export import export_onnx

            onnx_path = f"{self.output_dir}/{d}_{current_step}.onnx"
            try:
                export_onnx(
                    params, self.action_size, self.ppo_params, self.obs_size,
                    output_path=onnx_path,
                    metadata=getattr(self, "deploy_metadata", None),
                )
            except Exception as e:  # keep training alive if export breaks
                print(f"ONNX export failed: {e}")

    def train(self) -> None:
        self.ppo_params = brax_ppo_config("BerkeleyHumanoidJoystickFlatTerrain")
        overrides = {
            "num_timesteps": self.num_timesteps,
            "num_envs": self.args.num_envs,
            "batch_size": self.args.num_envs // self.ppo_params.num_minibatches,
            "num_evals": self.args.num_evals,
            "num_eval_envs": self.args.num_eval_envs,
        }
        for k, v in overrides.items():
            setattr(self.ppo_params, k, v)
        training_params = dict(self.ppo_params)
        network_cfg = dict(training_params.pop("network_factory"))
        network_cfg["policy_hidden_layer_sizes"] = tuple(
            network_cfg["policy_hidden_layer_sizes"]
        )
        network_cfg["value_hidden_layer_sizes"] = tuple(
            network_cfg["value_hidden_layer_sizes"]
        )
        print(f"PPO params: {training_params}")

        train_fn = functools.partial(
            ppo.train,
            **training_params,
            network_factory=network_cfg,
            randomization_fn=self.randomizer,
            progress_fn=self.progress_callback,
            policy_params_fn=self.policy_params_fn,
            restore_checkpoint_path=self.restore_checkpoint_path,
            seed=self.args.seed,
            host_loop=getattr(self.args, "host_loop", None),
            # passed on EVERY process: ppo gates the disk write on host0 but
            # all processes must join the save/resume collectives and agree
            # on start_epoch
            save_full_state_dir=(
                str(self.output_dir)
                if not self.args.no_full_state_checkpoints else None
            ),
            auto_resume=self.args.auto_resume,
            keep_full_states=self.args.keep_full_states,
            save_full_state_every=self.args.save_full_state_every,
        )
        _, params, _ = train_fn(environment=self.env, eval_env=self.eval_env)
        return params


class OpenDuckMiniV2Runner(BaseRunner):
    def __init__(self, args):
        super().__init__(args)
        available_envs = {
            "joystick": (joystick, joystick.Joystick),
            "standing": (standing, standing.Standing),
        }
        if args.env not in available_envs:
            raise ValueError(f"Unknown env {args.env}")
        module, cls = available_envs[args.env]
        self.env_config = module.default_config()
        # gait-clock conditioning overrides (joystick only; see
        # envs/joystick.py default_config for the law)
        overrides = {}
        self.deploy_metadata = None
        if args.env == "joystick":
            if args.phase_freq_range is not None:
                overrides["phase_frequency_range"] = list(args.phase_freq_range)
            if args.phase_freq_vx_ref > 0.0:
                overrides["phase_frequency_vx_ref"] = args.phase_freq_vx_ref
                overrides["phase_frequency_max"] = args.phase_freq_max
                # carried in the exported ONNX so deploy applies the same
                # law with no CLI knob (deploy/policy_loop.py)
                self.deploy_metadata = {
                    "phase_frequency_vx_ref": repr(args.phase_freq_vx_ref),
                    "phase_frequency_max": repr(args.phase_freq_max),
                }
        self.env = cls(task=args.task, config_overrides=overrides or None)
        self.eval_env = cls(task=args.task, config_overrides=overrides or None)
        self.randomizer = (
            None if args.no_domain_randomization else randomize.domain_randomize
        )
        self.action_size = self.env.action_size
        self.obs_size = int(self.env.observation_size["state"][0])
        self.restore_checkpoint_path = args.restore_checkpoint_path
        print(f"Observation size: {self.obs_size}")


def main() -> None:
    parser = argparse.ArgumentParser(description="Open Duck Mini Runner Script")
    parser.add_argument("--output_dir", type=str, default="checkpoints")
    parser.add_argument("--num_timesteps", type=int, default=150_000_000)
    parser.add_argument("--env", type=str, default="joystick")
    parser.add_argument("--task", type=str, default="flat_terrain")
    parser.add_argument("--restore_checkpoint_path", type=str, default=None)
    parser.add_argument("--num_envs", type=int, default=8192)
    # 1024 (one Pallas block), not brax's 128: eval batches that don't
    # divide the 1024-env kernel block fall back to the XLA pipeline, whose
    # TPU compile is ~45 min vs ~90 s for the fused kernel.
    parser.add_argument("--num_eval_envs", type=int, default=1024)
    parser.add_argument("--num_evals", type=int, default=15)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--no_domain_randomization", action="store_true")
    # gait-clock conditioning (round-4 recipe; defaults = reference parity)
    parser.add_argument("--phase_freq_range", type=float, nargs=2, default=None,
                        metavar=("LO", "HI"),
                        help="per-episode gait-clock factor ~ U(LO, HI)")
    parser.add_argument("--phase_freq_vx_ref", type=float, default=0.0,
                        help="enable factor=clip(|cmd_vx|/REF, 1, max); "
                             "carried into ONNX metadata for deploy")
    parser.add_argument("--phase_freq_max", type=float, default=1.4)
    parser.add_argument("--skip_onnx_export", action="store_true")
    # curve-preserving resume: full train state (params + optimizer +
    # env batch + RNG) is checkpointed per epoch under output_dir with
    # rotation; --auto_resume continues a killed run bit-exactly
    parser.add_argument("--auto_resume", action="store_true")
    parser.add_argument("--keep_full_states", type=int, default=2)
    # save every N epochs (final/stop epochs always saved): the gather+write
    # is ~5.5 s at 8192 envs (RESULTS/r5/mfu_epoch_npz.json) vs a ~27 s
    # epoch — raise N to amortize when resume granularity can afford it
    parser.add_argument("--save_full_state_every", type=int, default=1)
    parser.add_argument("--no_full_state_checkpoints", action="store_true")
    # epoch granularity: jitted scan-over-steps (TPU default) vs host loop
    # over one jitted training step (CPU default — the whole-epoch program's
    # XLA:CPU codegen runs >110 min and recompiles per recipe length)
    parser.add_argument("--host_loop", dest="host_loop", default=None,
                        action="store_true")
    parser.add_argument("--no_host_loop", dest="host_loop",
                        action="store_false")
    # multi-host launch (one process per host; see parallel/mesh.py):
    #   python -m ...runner --coordinator_address h0:1234 \
    #       --num_processes 2 --process_id $RANK ...
    # Seeding is host-invariant by construction: all RNG derives from
    # --seed inside globally-jitted SPMD programs over the full-slice mesh,
    # so N hosts reproduce the 1-host stream (no per-process streams).
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    # backend override: the axon TPU plugin's sitecustomize forces
    # JAX_PLATFORMS=axon, so CPU runs need the in-Python config update
    # (the env var alone is ignored on this image)
    parser.add_argument("--platform", type=str, default=None,
                        help="jax platform override, e.g. 'cpu'")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    # must run before anything initializes a jax backend
    from open_duck_playground_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=args.coordinator_address,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    runner = OpenDuckMiniV2Runner(args)
    runner.train()


if __name__ == "__main__":
    main()
