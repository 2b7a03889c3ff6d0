"""Training orchestration: generations of on-device rollouts + REFER updates.

korali's generation loop (Episodes Per Generation = 10, run-vracer-burger.py:128)
becomes: collect `num_envs` episodes as ONE jitted scan, insert into the
on-device replay, then run gradient updates at a replay-reuse rate matching
korali's `Experiences Between Policy Updates` economics.

korali consumes 256 experiences per update at 1 update per 0.5 new experiences
=> replay reuse ~512x.  Our minibatch is whole episodes (K*T experiences), so
updates/generation = new_experiences * reuse_ratio / (K*T).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from marlpde_tpu.envs.rollout import Env, collect_episodes
from marlpde_tpu.rl import replay as replay_mod
from marlpde_tpu.rl import vracer


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    num_envs: int = 16                 # episodes per generation
    max_experiences: float = 5e5       # korali Termination Criteria (run-vracer-burger.py:195)
    reuse_ratio: float = 512.0         # korali: 256 exp/update / 0.5 exp-between-updates
    max_updates_per_gen: int = 200
    seed: int = 42
    log_every: int = 1
    testing_frequency: int = 0         # generations between deterministic evals (0 = off)
    testing_episodes: int = 8
    # s["Custom Settings"]["Save Episode"] equivalent (run-vracer-burger.py:120,
    # burger_environment.py:207-238): dump collected episodes whose cumulative
    # reward clears a threshold (burger_fd_environment.py:211 saves > -1.0).
    save_episodes_dir: Optional[str] = None
    save_episodes_threshold: float = -np.inf
    # fuse one whole generation (collect + replay insert + normalizer update +
    # all gradient updates) into a single jitted program: 1 dispatch per
    # generation instead of 3 + updates.  Dispatch latency dominates on
    # high-latency backends (the axon TPU tunnel); the RNG stream is identical
    # to the unfused path (tests/test_rl.py::TestFusedGeneration).
    fused: bool = False


def default_rl_config(env: Env, **overrides) -> vracer.VracerConfig:
    kw = dict(obs_dim=env.obs_dim, act_dim=env.act_dim,
              num_agents=env.num_agents, episode_length=env.episode_length,
              action_low=env.action_low, action_high=env.action_high)
    kw.update(overrides)
    return vracer.VracerConfig(**kw)


def train(env: Env, rl_cfg: Optional[vracer.VracerConfig] = None,
          tc: TrainerConfig = TrainerConfig(), verbose: bool = True,
          callback=None, init_ts=None, init_history=None):
    """Run training; returns (train_state, replay, history dict).

    ``init_ts``/``init_history``: resume from a checkpoint (the korali
    e.loadState equivalent, run-vracer-burger.py:59-62); experiences counting
    continues from the restored history."""
    rl_cfg = rl_cfg or default_rl_config(env)
    key = jax.random.key(tc.seed)
    key, k_init = jax.random.split(key)
    ts = init_ts if init_ts is not None else vracer.init_train(rl_cfg, k_init)
    rep = replay_mod.init(rl_cfg.replay_capacity_episodes, env.episode_length,
                          env.num_agents, env.obs_dim, env.act_dim)

    collect = jax.jit(lambda ts_, key_, base, consts: collect_episodes(
        env, rl_cfg, ts_, key_, tc.num_envs, base, consts=consts))
    collect_det = jax.jit(lambda ts_, key_, base, consts: collect_episodes(
        env, rl_cfg, ts_, key_, tc.testing_episodes, base, deterministic=True,
        consts=consts))
    add = jax.jit(replay_mod.add_episodes)
    observe = jax.jit(lambda ts_, b: vracer.observe_episodes(rl_cfg, ts_, b))

    @jax.jit
    def do_update(ts_, rep_, key_):
        kb, _ = jax.random.split(key_)
        batch = replay_mod.sample_episodes(rep_, kb, rl_cfg.mini_batch_episodes)
        return vracer.update(rl_cfg, ts_, batch)

    from marlpde_tpu.utils.profiling import Throughput
    throughput = Throughput()
    history = init_history if init_history else dict(
        gen=[], experiences=[], mean_return=[], mean_ep_len=[],
        updates=[], metrics=[], test_return=[], wall_time=[],
        env_steps_per_s=[])
    history.setdefault("env_steps_per_s", [])
    total_exp = history["experiences"][-1] if history.get("experiences") else 0
    episode_base = (history["gen"][-1] if history.get("gen") else 0) * tc.num_envs
    gen = history["gen"][-1] if history.get("gen") else 0
    t0 = time.time()
    T = env.episode_length
    new_exp_per_gen = tc.num_envs * T
    upd_per_gen = int(min(
        tc.max_updates_per_gen,
        max(1, new_exp_per_gen * tc.reuse_ratio
            / (rl_cfg.mini_batch_episodes * T))))

    @jax.jit
    def fused_generation(ts_, rep_, k_c, k_u, episode_base_, consts):
        """One whole generation in one XLA program.  RNG-key usage replicates
        the unfused loop exactly, so both paths are bitwise identical."""
        traj_, final_ = collect_episodes(env, rl_cfg, ts_, k_c, tc.num_envs,
                                         episode_base_, consts=consts)
        rep_ = replay_mod.add_episodes(rep_, traj_)
        ts_ = vracer.observe_episodes(rl_cfg, ts_, traj_)

        def run_updates(operand):
            t0_, k0 = operand

            def body(carry, _):
                t_, kk = carry
                kk, ki = jax.random.split(kk)
                kb, _ = jax.random.split(ki)
                batch = replay_mod.sample_episodes(
                    rep_, kb, rl_cfg.mini_batch_episodes)
                t_, m = vracer.update(rl_cfg, t_, batch)
                return (t_, kk), m

            (t1, _), ms = jax.lax.scan(body, (t0_, k0), None,
                                       length=upd_per_gen)
            return t1, jax.tree.map(lambda a: a[-1], ms)

        mshape = jax.eval_shape(run_updates, (ts_, k_u))[1]

        def skip_updates(operand):
            t0_, _ = operand
            return t0_, jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), mshape)

        did = rep_.filled >= rl_cfg.replay_start_episodes
        ts_, metrics_ = jax.lax.cond(did, run_updates, skip_updates,
                                     (ts_, k_u))
        stats = dict(
            mean_return=final_.cum_reward.reshape(tc.num_envs, -1).mean(),
            ep_len=traj_["mask"].sum(1).mean(),
            n_upd=jnp.where(did, upd_per_gen, 0))
        return ts_, rep_, traj_, final_, metrics_, stats

    while total_exp < tc.max_experiences:
        key, k_c, k_u = jax.random.split(key, 3)
        if tc.fused:
            ts, rep, traj, final, metrics, stats = fused_generation(
                ts, rep, k_c, k_u, jnp.asarray(episode_base), env.consts)
            episode_base += tc.num_envs
            total_exp += new_exp_per_gen
            gen += 1
            n_upd = int(stats["n_upd"])
            metrics = metrics if n_upd else {}
        else:
            traj, final = collect(ts, k_c, jnp.asarray(episode_base), env.consts)
            rep = add(rep, traj)
            ts = observe(ts, traj)
            episode_base += tc.num_envs
            total_exp += new_exp_per_gen
            gen += 1

            metrics = {}
            n_upd = 0
            if int(rep.filled) >= rl_cfg.replay_start_episodes:
                for i in range(upd_per_gen):
                    k_u, k_i = jax.random.split(k_u)
                    ts, metrics = do_update(ts, rep, k_i)
                    n_upd += 1

        mean_ret = float(final.cum_reward.mean())
        ep_len = float(traj["mask"].sum(1).mean())
        history["gen"].append(gen)
        history["experiences"].append(total_exp)
        history["mean_return"].append(mean_ret)
        history["mean_ep_len"].append(ep_len)
        history["updates"].append(n_upd)
        history["metrics"].append({k: float(v) for k, v in metrics.items()})
        history["wall_time"].append(time.time() - t0)
        throughput.tick(new_exp_per_gen)
        history["env_steps_per_s"].append(throughput.rate())

        if tc.save_episodes_dir:
            # cum_reward is (B,) for single-return envs, (B, na) for MARL
            cum = np.asarray(final.cum_reward).reshape(tc.num_envs, -1).mean(-1)
            keep = cum > tc.save_episodes_threshold
            if keep.any():
                os.makedirs(tc.save_episodes_dir, exist_ok=True)
                np.savez_compressed(
                    os.path.join(tc.save_episodes_dir, f"episodes_gen{gen}.npz"),
                    actions=np.asarray(traj["actions"])[keep],
                    rewards=np.asarray(traj["rewards"])[keep],
                    obs=np.asarray(traj["obs"])[keep],
                    cumreward=np.asarray(final.cum_reward)[keep])

        if tc.testing_frequency and gen % tc.testing_frequency == 0:
            key, k_t = jax.random.split(key)
            ttraj, tfinal = collect_det(ts, k_t, jnp.asarray(0), env.consts)
            history["test_return"].append(float(tfinal.cum_reward.mean()))
        if verbose and gen % tc.log_every == 0:
            print(f"[trainer] gen {gen} exp {total_exp} return {mean_ret:.5f} "
                  f"eplen {ep_len:.1f} updates {n_upd} "
                  f"beta {metrics.get('beta', '-')}", flush=True)
        if callback is not None:
            callback(gen, ts, rep, history)

    return ts, rep, history


def evaluate(env: Env, rl_cfg, ts, key, n_episodes: int = 8):
    """Deterministic-policy evaluation; returns per-episode returns (n,na)."""
    traj, final = collect_episodes(env, rl_cfg, ts, key, n_episodes,
                                   deterministic=True)
    return np.asarray(final.cum_reward)
