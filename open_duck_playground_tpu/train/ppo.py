"""PPO actor-learner, Brax-PPO semantics, sharded over a TPU device mesh.

Replaces `brax.training.agents.ppo.train` for this framework (the
reference's L3 training stack, SURVEY.md section 2b): batched on-device
rollouts via lax.scan over env.step, GAE with truncation masking, clipped
surrogate + 0.25*value-error^2 + entropy bonus, running-statistics obs
normalization (asymmetric actor/critic keys), minibatched Adam epochs with
global-norm clipping.

TPU-first distribution: instead of the reference stack's pmap+psum, the
env-state batch is sharded along a 1-D `Mesh(("env",))` with NamedSharding,
learner params replicated; a single jit of the whole training epoch lets
XLA SPMD insert the cross-chip reductions (gradients, normalizer stats)
over ICI. Runs unchanged on 1 chip, N chips, or the CPU virtual-device
mesh used in tests.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from open_duck_playground_tpu.envs.wrapper import TrainEnv
from open_duck_playground_tpu.train import networks as nets

import optax

# set by train(profile_breakdown=True): the timing/cost dict of the last
# breakdown, for harnesses that want the artifact without parsing stdout
LAST_PROFILE_BREAKDOWN: Optional[Dict[str, Any]] = None

# executable-cache entries of the last run's epoch program (scan mode
# only, i.e. host_loop=False); 1 means every epoch reused one compile
LAST_EPOCH_PROGRAM_VARIANTS: Optional[int] = None


class Transition(NamedTuple):
    observation: Dict[str, jax.Array]
    action: jax.Array
    reward: jax.Array
    discount: jax.Array
    next_observation: Dict[str, jax.Array]
    truncation: jax.Array
    raw_action: jax.Array
    log_prob: jax.Array


@struct.dataclass
class TrainingState:
    params: nets.PPOParams
    normalizer: nets.RunningStatisticsState
    opt_state: Any
    env_steps: jax.Array


def compute_gae(truncation, termination, rewards, values, bootstrap_value,
                lambda_: float, discount: float):
    """Brax-semantics GAE: deltas masked at truncation boundaries."""
    truncation_mask = 1 - truncation
    values_t_plus_1 = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    deltas = rewards + discount * (1 - termination) * values_t_plus_1 - values
    deltas *= truncation_mask

    def body(acc, xs):
        tmask, delta, term = xs
        acc = delta + discount * (1 - term) * tmask * lambda_ * acc
        return acc, acc

    _, vs_minus_v_xs = jax.lax.scan(
        body, jnp.zeros_like(bootstrap_value),
        (truncation_mask, deltas, termination), reverse=True,
    )
    vs = vs_minus_v_xs + values
    vs_t_plus_1 = jnp.concatenate([vs[1:], bootstrap_value[None]], axis=0)
    advantages = (rewards + discount * (1 - termination) * vs_t_plus_1 - values) * truncation_mask
    return jax.lax.stop_gradient(vs), jax.lax.stop_gradient(advantages)


def train(
    environment,
    eval_env=None,
    *,
    num_timesteps: int,
    episode_length: int = 1000,
    num_envs: int = 8192,
    num_eval_envs: int = 128,
    action_repeat: int = 1,
    unroll_length: int = 20,
    num_minibatches: int = 32,
    batch_size: int = 256,
    num_updates_per_batch: int = 4,
    learning_rate: float = 3e-4,
    entropy_cost: float = 5e-3,
    discounting: float = 0.97,
    gae_lambda: float = 0.95,
    clipping_epsilon: float = 0.2,
    normalize_advantage: bool = True,
    reward_scaling: float = 1.0,
    normalize_observations: bool = True,
    max_grad_norm: Optional[float] = 1.0,
    num_evals: int = 15,
    deterministic_eval: bool = False,
    seed: int = 0,
    network_factory: Optional[Callable] = None,
    randomization_fn=None,
    progress_fn: Optional[Callable] = None,
    policy_params_fn: Optional[Callable] = None,
    restore_checkpoint_path: Optional[str] = None,
    mesh: Optional[Mesh] = None,
    num_timesteps_override_warning: bool = False,
    host_loop: Optional[bool] = None,
    save_full_state_dir: Optional[str] = None,
    auto_resume: bool = False,
    keep_full_states: int = 2,
    save_full_state_every: int = 1,
    stop_after_epochs: Optional[int] = None,
    profile_breakdown: bool = False,
    resume_shared_fs: bool = False,
):
    """Train PPO; returns (make_policy, (normalizer, params), metrics).

    Call signature and return contract mirror brax ppo.train as consumed by
    the reference runner (common/runner.py:104-118): `params[0]` is the obs
    normalizer, `params[1].policy["params"]` the policy MLP pytree.
    """
    assert num_envs == batch_size * num_minibatches, (
        "brax-PPO layout requires num_envs == batch_size * num_minibatches"
    )
    key = jax.random.PRNGKey(seed)
    key, env_key, net_key, rand_key = jax.random.split(key, 4)

    if mesh is None:
        mesh = Mesh(np.array(jax.devices()), ("env",))
    n_dev = mesh.devices.size
    assert num_envs % n_dev == 0, (num_envs, n_dev)
    sh_env = NamedSharding(mesh, P("env"))
    sh_rep = NamedSharding(mesh, P())
    # let the fused Pallas step shard_map itself over this mesh
    from open_duck_playground_tpu.parallel import mesh as mesh_mod

    mesh_mod.set_env_mesh(mesh if n_dev > 1 else None)

    train_env = TrainEnv(
        environment,
        num_envs=num_envs,
        episode_length=episode_length,
        action_repeat=action_repeat,
        randomization_fn=randomization_fn,
        randomization_rng=rand_key,
    )

    obs_sizes = {k: v[0] for k, v in environment.observation_size.items()}
    action_size = environment.action_size
    nf_kwargs = {}
    if network_factory is not None:
        nf_kwargs = network_factory if isinstance(network_factory, dict) else {}
    network = nets.PPONetworks(obs_sizes, action_size, **nf_kwargs)

    params = network.init(net_key)
    normalizer = nets.rs_init(obs_sizes)

    tx = optax.adam(learning_rate=learning_rate)
    if max_grad_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    opt_state = tx.init(params)

    training_state = TrainingState(
        params=params, normalizer=normalizer, opt_state=opt_state,
        env_steps=jnp.zeros((), jnp.int64 if jax.config.jax_enable_x64 else jnp.int32),
    )

    if restore_checkpoint_path is not None:
        from open_duck_playground_tpu.train import checkpoint as ckpt

        normalizer, params = ckpt.load(restore_checkpoint_path, (normalizer, params))
        training_state = training_state.replace(params=params, normalizer=normalizer)

    stochastic_policy = network.make_policy_fn(deterministic=False)
    eval_policy = network.make_policy_fn(deterministic=deterministic_eval)

    def make_policy(full_params, deterministic: bool = False):
        fn = network.make_policy_fn(deterministic=deterministic)
        return functools.partial(fn, full_params)

    # ------------------------------------------------------------------
    # loss (data leaves: [T, b, ...])
    # ------------------------------------------------------------------
    def loss_fn(params, normalizer, data: Transition, rng):
        logits = network.policy_logits(params, normalizer, data.observation)
        loc, scale = nets.dist_create(logits)
        baseline = network.value(params, normalizer, data.observation)
        terminal_obs = jax.tree_util.tree_map(lambda x: x[-1], data.next_observation)
        bootstrap_value = network.value(params, normalizer, terminal_obs)

        rewards = data.reward * reward_scaling
        truncation = data.truncation
        termination = (1 - data.discount) * (1 - truncation)

        target_lp = nets.dist_log_prob(loc, scale, data.raw_action)
        rho = jnp.exp(target_lp - data.log_prob)

        vs, advantages = compute_gae(
            truncation, termination, rewards, baseline, bootstrap_value,
            lambda_=gae_lambda, discount=discounting,
        )
        if normalize_advantage:
            advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)

        surrogate1 = rho * advantages
        surrogate2 = jnp.clip(rho, 1 - clipping_epsilon, 1 + clipping_epsilon) * advantages
        policy_loss = -jnp.mean(jnp.minimum(surrogate1, surrogate2))

        v_error = vs - baseline
        v_loss = jnp.mean(v_error * v_error) * 0.5 * 0.5

        entropy = jnp.mean(nets.dist_entropy(loc, scale, rng))
        entropy_loss = -entropy_cost * entropy

        total = policy_loss + v_loss + entropy_loss
        return total, {
            "total_loss": total,
            "policy_loss": policy_loss,
            "v_loss": v_loss,
            "entropy_loss": entropy_loss,
        }

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # ------------------------------------------------------------------
    # one training step: rollout + normalizer update + SGD epochs
    # ------------------------------------------------------------------
    def rollout(env_state, full_params, key):
        def step_fn(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            action, extras = stochastic_policy(full_params, state.obs, k)
            nstate = train_env.step(state, action)
            t = Transition(
                observation=state.obs,
                action=action,
                reward=nstate.reward,
                discount=1.0 - nstate.done,
                next_observation=nstate.obs,
                truncation=nstate.info["truncation"],
                raw_action=extras["raw_action"],
                log_prob=extras["log_prob"],
            )
            return (nstate, key), t

        (env_state, _), data = jax.lax.scan(
            step_fn, (env_state, key), None, length=unroll_length
        )
        return env_state, data  # leaves [T, num_envs, ...]

    def sgd_step(training_state: TrainingState, data: Transition, key):
        if normalize_observations:
            normalizer = nets.rs_update(training_state.normalizer, data.observation)
        else:
            normalizer = training_state.normalizer

        def minibatch_step(carry, mb_data):
            params, opt_state, key = carry
            key, k = jax.random.split(key)
            (_, aux), grads = grad_fn(params, normalizer, mb_data, k)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), aux

        def epoch(carry, _):
            params, opt_state, key = carry
            key, kperm, kmb = jax.random.split(key, 3)
            perm = jax.random.permutation(kperm, num_envs)
            shuf = jax.tree_util.tree_map(lambda x: jnp.take(x, perm, axis=1), data)
            mb = jax.tree_util.tree_map(
                lambda x: x.reshape(
                    (x.shape[0], num_minibatches, batch_size) + x.shape[2:]
                ).swapaxes(0, 1),
                shuf,
            )
            (params, opt_state, _), aux = jax.lax.scan(
                minibatch_step, (params, opt_state, kmb), mb
            )
            return (params, opt_state, key), aux

        (params, opt_state, _), aux = jax.lax.scan(
            epoch,
            (training_state.params, training_state.opt_state, key),
            None,
            length=num_updates_per_batch,
        )
        return training_state.replace(
            params=params, normalizer=normalizer, opt_state=opt_state
        ), aux

    env_step_per_training_step = batch_size * unroll_length * num_minibatches * action_repeat
    num_evals_after_init = max(num_evals - 1, 1)
    num_training_steps_per_epoch = int(
        np.ceil(num_timesteps / (num_evals_after_init * env_step_per_training_step))
    )

    def training_step(carry, _):
        training_state, env_state, key = carry
        key, k_roll, k_sgd = jax.random.split(key, 3)
        env_state, data = rollout(
            env_state, (training_state.normalizer, training_state.params), k_roll
        )
        training_state, aux = sgd_step(training_state, data, k_sgd)
        training_state = training_state.replace(
            env_steps=training_state.env_steps + env_step_per_training_step
        )
        metrics = jax.tree_util.tree_map(jnp.mean, aux)
        return (training_state, env_state, key), metrics

    # Epoch granularity: on TPU one jit of the whole epoch (scan over
    # training steps — zero host round-trips between rollout/SGD). On CPU
    # XLA's LLVM codegen of that giant program runs >110 min on this
    # image's single core AND the program embeds the scan trip count, so
    # every (num_timesteps, num_evals) combination recompiles from
    # scratch (VERDICT r2 #7). host_loop jits ONE training step and loops
    # on the host: the compiled unit is recipe-length-independent (the
    # persistent cache reuses it across recipes) and the per-epoch host
    # dispatch is ~num_training_steps syncs of a 20x-num_envs-step
    # program — noise on CPU throughput.
    if host_loop is None:
        host_loop = jax.default_backend() == "cpu"

    # NOTE: env_state cannot be donated: info["first_data"]/"first_obs"
    # alias state.data/state.obs buffers right after reset (XLA output
    # aliasing), and donating aliased buffers is an error.
    if host_loop:
        training_step_jit = jax.jit(training_step)

        def training_epoch(training_state, env_state, key):
            step_metrics = []
            for _ in range(num_training_steps_per_epoch):
                (training_state, env_state, key), m = training_step_jit(
                    (training_state, env_state, key), None
                )
                step_metrics.append(m)
            metrics = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs).mean(), *step_metrics
            )
            return training_state, env_state, key, metrics
    else:
        @jax.jit
        def training_epoch(training_state, env_state, key):
            (training_state, env_state, key), metrics = jax.lax.scan(
                training_step, (training_state, env_state, key), None,
                length=num_training_steps_per_epoch,
            )
            metrics = jax.tree_util.tree_map(jnp.mean, metrics)
            return training_state, env_state, key, metrics

    # ------------------------------------------------------------------
    # evaluator
    # ------------------------------------------------------------------
    eval_wrapped = None
    if eval_env is not None:
        eval_wrapped = TrainEnv(
            eval_env, num_envs=num_eval_envs, episode_length=episode_length,
            action_repeat=action_repeat, randomization_fn=None,
        )

        @jax.jit
        def run_eval(full_params, key):
            key, reset_key = jax.random.split(key)
            state = eval_wrapped.reset(reset_key)
            metric_keys = {k: jnp.zeros(num_eval_envs) for k in state.metrics}

            def step_fn(carry, _):
                state, active, sums, metric_sums, length, key = carry
                key, k = jax.random.split(key)
                action, _ = eval_policy(full_params, state.obs, k)
                nstate = eval_wrapped.step(state, action)
                sums = sums + nstate.reward * active
                metric_sums = {
                    k2: v + nstate.metrics[k2] * active for k2, v in metric_sums.items()
                }
                length = length + active
                active = active * (1.0 - nstate.done)
                return (nstate, active, sums, metric_sums, length, key), None

            active0 = jnp.ones(num_eval_envs)
            sums0 = jnp.zeros(num_eval_envs)
            len0 = jnp.zeros(num_eval_envs)
            (state, active, sums, metric_sums, lengths, _), _ = jax.lax.scan(
                step_fn,
                (state, active0, sums0, metric_keys, len0, key),
                None,
                length=episode_length // action_repeat,
            )
            out = {
                "eval/episode_reward": jnp.mean(sums),
                "eval/episode_reward_std": jnp.std(sums),
                "eval/avg_episode_length": jnp.mean(lengths),
            }
            for k2, v in metric_sums.items():
                out[f"eval/episode_{k2}"] = jnp.mean(v)
            return out

    # ------------------------------------------------------------------
    # main loop (host-side orchestration; device work stays sharded)
    # ------------------------------------------------------------------
    key, reset_key, epoch_key, eval_key = jax.random.split(key, 4)
    t0 = time.monotonic()
    env_state = jax.jit(train_env.reset, out_shardings=sh_env)(reset_key)
    jax.block_until_ready(env_state.reward)
    print(f"[ppo] env reset ({num_envs} envs) compiled+ran in "
          f"{time.monotonic() - t0:.1f}s", flush=True)
    if jax.process_count() > 1:
        # NOT jax.device_put: for multi-process shardings it runs a hidden
        # multihost_utils.assert_equal — a gloo allgather at arbitrary
        # startup time, which flaked with a connect timeout in the round-5
        # sustained run (stage-2 resume leg). The train state is identical
        # across processes by construction (same seed), so place it
        # collective-free.
        def _put_rep(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sh_rep, lambda idx: x[idx])

        training_state = jax.tree_util.tree_map(_put_rep, training_state)
    else:
        training_state = jax.device_put(training_state, sh_rep)

    # curve-preserving resume: restore the complete train state (params,
    # optimizer, env batch, host RNG keys) saved after an earlier epoch, so
    # the remaining epochs replay the uninterrupted run bit-for-bit
    start_epoch = 0
    if auto_resume and save_full_state_dir is not None:
        from open_duck_playground_tpu.train import checkpoint as ckpt

        target = {
            "training_state": training_state,
            "env_state": env_state,
            "epoch_key": epoch_key,
            "eval_key": eval_key,
        }
        if jax.process_count() > 1 and resume_shared_fs:
            # shared filesystem: every process reads the SAME directory, so
            # the decision is deterministic per process and the state loads
            # locally — zero ad-hoc collectives. Motivated by round 5: the
            # pre-training broadcast_one_to_all below needs fresh gloo pair
            # connections under multi-minute rank compile skew and timed
            # out repeatedly, while in-program (jit) collectives were fine.
            found = ckpt.latest_full(save_full_state_dir)
            if found is not None:
                resume_epoch, resume_path = found
                template = jax.tree_util.tree_map(
                    lambda x: np.zeros(x.shape, x.dtype), target)
                restored = ckpt.load_full(resume_path, template)

                def _put_l(x, sh):
                    x = np.asarray(x)
                    return jax.make_array_from_callback(
                        x.shape, sh, lambda idx: x[idx])

                training_state = jax.tree_util.tree_map(
                    lambda x: _put_l(x, sh_rep), restored["training_state"])
                env_state = jax.tree_util.tree_map(
                    lambda x: _put_l(x, sh_env), restored["env_state"])
                epoch_key = jnp.asarray(restored["epoch_key"])
                eval_key = jnp.asarray(restored["eval_key"])
                start_epoch = resume_epoch + 1
                print(f"[ppo] resumed full train state (shared fs) epoch "
                      f"{resume_epoch}, env_steps "
                      f"{int(training_state.env_steps)}", flush=True)
        elif jax.process_count() > 1:
            # multi-process: host0 decides and loads; the state is broadcast
            # so every process agrees on start_epoch (a per-process decision
            # would desync the collective schedule) and resume works without
            # a shared filesystem
            from jax.experimental import multihost_utils

            found = (ckpt.latest_full(save_full_state_dir)
                     if jax.process_index() == 0 else None)
            resume_epoch = int(multihost_utils.broadcast_one_to_all(
                np.int32(found[0] if found else -1)))
            if resume_epoch >= 0:
                # numpy template at GLOBAL shapes (x.shape on a global Array
                # is the global shape, so this is process-independent)
                template = jax.tree_util.tree_map(
                    lambda x: np.zeros(x.shape, x.dtype), target)
                if jax.process_index() == 0:
                    host_state = ckpt.load_full(
                        ckpt.full_path(save_full_state_dir, resume_epoch),
                        template)
                else:
                    host_state = template
                restored = multihost_utils.broadcast_one_to_all(host_state)

                def _put(x, sh):
                    x = np.asarray(x)
                    return jax.make_array_from_callback(
                        x.shape, sh, lambda idx: x[idx])

                training_state = jax.tree_util.tree_map(
                    lambda x: _put(x, sh_rep), restored["training_state"])
                env_state = jax.tree_util.tree_map(
                    lambda x: _put(x, sh_env), restored["env_state"])
                epoch_key = jnp.asarray(restored["epoch_key"])
                eval_key = jnp.asarray(restored["eval_key"])
                start_epoch = resume_epoch + 1
                print(f"[ppo] resumed full train state (broadcast) epoch "
                      f"{resume_epoch}, env_steps "
                      f"{int(training_state.env_steps)}", flush=True)
        else:
            found = ckpt.latest_full(save_full_state_dir)
            if found is not None:
                resume_epoch, resume_path = found
                restored = ckpt.load_full(resume_path, target)
                training_state = jax.device_put(
                    restored["training_state"], sh_rep)
                env_state = jax.device_put(restored["env_state"], sh_env)
                epoch_key = restored["epoch_key"]
                eval_key = restored["eval_key"]
                start_epoch = resume_epoch + 1
                print(f"[ppo] resumed full train state from {resume_path} "
                      f"(epoch {resume_epoch}, env_steps "
                      f"{int(training_state.env_steps)})", flush=True)

    def _save_full_state(epoch_i: int):
        if save_full_state_dir is None:
            return
        from open_duck_playground_tpu.train import checkpoint as ckpt

        t_g = time.monotonic()
        if jax.process_count() > 1:
            # env_state is env-sharded across processes: device_get would
            # fail on non-addressable shards, so gather the global value
            # (every process must join this collective), then host0 writes
            from jax.experimental import multihost_utils

            env_np = multihost_utils.process_allgather(env_state, tiled=True)
        else:
            env_np = jax.device_get(env_state)
        state = {
            "training_state": jax.device_get(training_state),
            "env_state": env_np,
            "epoch_key": jax.device_get(epoch_key),
            "eval_key": jax.device_get(eval_key),
        }
        t_g = time.monotonic() - t_g
        if jax.process_index() != 0:
            return
        try:
            t_w = time.monotonic()
            ckpt.save_full(save_full_state_dir, epoch_i, state,
                           keep=keep_full_states)
            t_w = time.monotonic() - t_w
            print(f"[ppo] full-state save epoch {epoch_i}: gather "
                  f"{t_g:.2f}s write {t_w:.2f}s", flush=True)
        except Exception as e:  # keep training alive if the save breaks
            print(f"[ppo] full-state checkpoint failed: {e}", flush=True)

    metrics: Dict[str, float] = {}

    def _eval_and_report(step_count: int):
        nonlocal metrics, eval_key
        if eval_wrapped is not None:
            eval_key, k = jax.random.split(eval_key)
            t0 = time.monotonic()
            eval_metrics = run_eval(
                (training_state.normalizer, training_state.params), k
            )
            # merge, don't replace: the caller just wrote training/* metrics
            # (sps, losses) into `metrics` and progress_fn must see both
            metrics.update({k2: float(v) for k2, v in eval_metrics.items()})
            print(f"[ppo] eval rollout done in {time.monotonic() - t0:.1f}s",
                  flush=True)
        if progress_fn is not None:
            progress_fn(step_count, metrics)
        if policy_params_fn is not None:
            policy_params_fn(
                step_count, make_policy,
                (training_state.normalizer, training_state.params),
            )

    if profile_breakdown:
        # Time the REAL jitted sub-programs the epoch is made of (not
        # re-implementations), so the end-to-end sps can be attributed:
        # rollout vs SGD vs eval vs full-state checkpoint (VERDICT r4 #2/#6).
        # Uses throwaway keys and discards outputs — training semantics and
        # the epoch_key/eval_key streams are untouched.
        import json as _json

        def _timed(fn, *args):
            out = fn(*args)  # compile + warmup
            jax.block_until_ready(out)
            t = time.monotonic()
            out = fn(*args)
            jax.block_until_ready(out)
            return time.monotonic() - t, out

        pk = jax.random.PRNGKey(0xB0)
        bd: Dict[str, Any] = {"num_envs": num_envs,
                              "unroll_length": unroll_length,
                              "env_steps_per_training_step":
                                  env_step_per_training_step}
        rollout_jit = jax.jit(rollout)
        t_roll, (_, data0) = _timed(
            rollout_jit, env_state,
            (training_state.normalizer, training_state.params), pk)
        bd["rollout_s"] = round(t_roll, 4)
        bd["rollout_env_sps"] = round(num_envs * unroll_length / t_roll, 1)
        sgd_jit = jax.jit(sgd_step)
        t_sgd, _ = _timed(sgd_jit, training_state, data0, pk)
        bd["sgd_s"] = round(t_sgd, 4)
        tstep_jit = jax.jit(lambda c: training_step(c, None)[0])
        t_step, _ = _timed(tstep_jit, (training_state, env_state, pk))
        bd["training_step_s"] = round(t_step, 4)
        bd["e2e_env_sps"] = round(env_step_per_training_step / t_step, 1)
        try:
            ca = (tstep_jit.lower((training_state, env_state, pk))
                  .compile().cost_analysis())
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            bd["tstep_flops"] = float(ca.get("flops", -1.0))
            bd["tstep_bytes"] = float(ca.get("bytes accessed", -1.0))
        except Exception as e:  # cost model availability differs per backend
            bd["cost_analysis_error"] = str(e)
        if eval_wrapped is not None:
            t_eval, _ = _timed(
                run_eval, (training_state.normalizer, training_state.params),
                pk)
            bd["eval_s"] = round(t_eval, 4)
        if save_full_state_dir is not None:
            t0p = time.monotonic()
            _save_full_state(start_epoch)
            bd["full_state_save_s"] = round(time.monotonic() - t0p, 4)
        bd["num_training_steps_per_epoch"] = num_training_steps_per_epoch
        global LAST_PROFILE_BREAKDOWN
        LAST_PROFILE_BREAKDOWN = bd
        print(f"[ppo] profile_breakdown {_json.dumps(bd)}", flush=True)

    if start_epoch == 0:
        _eval_and_report(0)

    # Canonicalize the carry before the loop: epoch_key starts as an
    # UNCOMMITTED host-split key while training_epoch returns a committed,
    # explicitly-sharded one — the aval/sharding mismatch made the SECOND
    # epoch call recompile the entire epoch program (a second ~7-min
    # compile of the giant scan on a cold cache — observed round 5,
    # epoch-2 sps 102k vs steady 1.57M). Commit every carry member to the
    # sharding the epoch outputs use; then every epoch hits one executable
    # (asserted by the `program variants` print below).
    def _strong(x):
        return (jax.lax.convert_element_type(x, x.dtype)
                if isinstance(x, jax.Array) else x)

    training_state = jax.tree_util.tree_map(_strong, training_state)
    env_state = jax.tree_util.tree_map(_strong, env_state)
    if jax.process_count() > 1:
        # collective-free placement (see the _put_rep comment above)
        _k = np.asarray(epoch_key)
        epoch_key = jax.make_array_from_callback(
            _k.shape, sh_rep, lambda idx: _k[idx])
    else:
        epoch_key = jax.device_put(jnp.asarray(epoch_key), sh_rep)
    # ...and give every carry leaf the exact sharding FLAVOR jit outputs
    # carry (on one device, explicit NamedSharding inputs vs the
    # SingleDeviceSharding of jit outputs are distinct cache signatures
    # even though shaped_abstractify agrees — the remaining variant-2
    # source on the single-chip TPU path). An identity jit round-trip
    # commits the carry the same way training_epoch will.
    training_state, env_state, epoch_key = jax.jit(
        lambda ts, es, k: (ts, es, k))(training_state, env_state, epoch_key)

    walltimes = []
    print(f"[ppo] entering training loop: {num_evals_after_init} epochs x "
          f"{num_training_steps_per_epoch} training steps", flush=True)
    for epoch_i in range(start_epoch, num_evals_after_init):
        t0 = time.monotonic()
        if os.environ.get("ODP_DEBUG_AVALS"):
            _in = (training_state, env_state, epoch_key)
        training_state, env_state, epoch_key, train_metrics = training_epoch(
            training_state, env_state, epoch_key
        )
        if os.environ.get("ODP_DEBUG_AVALS"):
            _out = (training_state, env_state, epoch_key)
            _li, _ = jax.tree_util.tree_flatten_with_path(_in)
            _lo, _ = jax.tree_util.tree_flatten_with_path(_out)
            for (pi, vi), (_, vo) in zip(_li, _lo):
                ai = jax.api_util.shaped_abstractify(vi)
                ao = jax.api_util.shaped_abstractify(vo)
                if ai != ao:
                    print(f"[ppo] AVAL DRIFT {jax.tree_util.keystr(pi)}: "
                          f"{ai} -> {ao}", flush=True)
        jax.block_until_ready(training_state.env_steps)
        walltimes.append(time.monotonic() - t0)
        sps = num_training_steps_per_epoch * env_step_per_training_step / walltimes[-1]
        metrics = {f"training/{k}": float(v) for k, v in train_metrics.items()}
        metrics["training/sps"] = sps
        metrics["training/walltime"] = sum(walltimes)
        _eval_and_report(int(training_state.env_steps))
        stopping = stop_after_epochs is not None and (
            epoch_i + 1 - start_epoch >= stop_after_epochs
        )
        # cadence knob: the gather+write is ~5.5 s at 8192 envs over the
        # tunnel (RESULTS/r5/mfu_epoch_npz.json) — every-N saves trade resume
        # granularity for epoch time. Always save on the final epoch and on
        # the stop_after_epochs crash-simulation exit (resume tests rely on
        # the stopped epoch's state being on disk).
        if ((epoch_i + 1 - start_epoch) % max(save_full_state_every, 1) == 0
                or epoch_i == num_evals_after_init - 1 or stopping):
            _save_full_state(epoch_i)
        if stopping:
            # crash-simulation hook for resume tests: exit mid-recipe with
            # the full state of `epoch_i` on disk, like a kill would
            print(f"[ppo] stop_after_epochs={stop_after_epochs}: stopping "
                  f"after epoch {epoch_i}", flush=True)
            break

    if hasattr(training_epoch, "_cache_size"):
        # 1 == the aval canonicalization held and every epoch reused one
        # executable; 2 would mean a second giant compile (regression —
        # asserted by tests/test_epoch_variants.py)
        global LAST_EPOCH_PROGRAM_VARIANTS
        LAST_EPOCH_PROGRAM_VARIANTS = int(training_epoch._cache_size())
        print(f"[ppo] training_epoch program variants: "
              f"{LAST_EPOCH_PROGRAM_VARIANTS}", flush=True)

    full_params = (training_state.normalizer, training_state.params)
    return make_policy, full_params, metrics
