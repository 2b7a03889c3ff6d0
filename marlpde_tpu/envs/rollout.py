"""On-device episode collection: policy-in-the-loop lax.scan over vmapped envs.

This replaces the reference's per-macro-step Python<->C++ ping-pong
(burger_environment.py:140 s.update() blocking on the korali agent): the policy
network is applied inside the scan body, so a whole generation of episodes is
one XLA computation.  The env batch axis is the scaling axis — shard it over a
device mesh (parallel/mesh.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from marlpde_tpu.rl import vracer


@dataclasses.dataclass(frozen=True)
class Env:
    """Uniform functional env interface over the concrete env modules.

    ``consts`` holds large runtime data (DNS pools) that must flow through jit
    boundaries as an ARGUMENT, never a python closure: closure-captured device
    arrays become compile-time constants, which bloats programs (and the axon
    remote-compile path chokes on multi-MB constant buffers outright).
    """

    name: str
    cfg: Any
    reset: Callable          # (consts, key, episode_count) -> (state, obs)
    step: Callable           # (consts, state, actions) -> (state, obs, reward, done, info)
    obs_dim: int
    num_agents: int
    act_dim: int             # actions per agent
    episode_length: int
    action_low: float
    action_high: float
    consts: Any = ()         # pytree of runtime constants (e.g. the DNS pool)

    def reset0(self, key, episode_count):
        """Convenience (outside jit): reset with self.consts bound."""
        return self.reset(self.consts, key, episode_count)

    def step0(self, state, actions):
        """Convenience (outside jit): step with self.consts bound."""
        return self.step(self.consts, state, actions)


def collect_episodes(env: Env, rl_cfg, ts, key, batch_size: int,
                     episode_base: int | jax.Array = 0, deterministic=False,
                     consts=None):
    """Roll out `batch_size` envs for a full episode.

    Returns a dict of stacked episode tensors with layout (B, T, na, ...):
    obs, actions, mu, sigma, rewards, mask — ready for replay.add_episodes —
    plus cum_rewards (B, na) and final env states.

    ``consts`` overrides env.consts (pass it through your jit boundary).
    """
    consts = env.consts if consts is None else consts
    k_reset, k_roll = jax.random.split(key)
    reset_keys = jax.random.split(k_reset, batch_size)
    counts = episode_base + jnp.arange(batch_size)
    state, obs = jax.vmap(lambda k, c: env.reset(consts, k, c))(reset_keys, counts)

    def macro(carry, k):
        st, ob = carry
        if deterministic:
            a = vracer.act_deterministic(rl_cfg, ts, ob)
            _, mu, sigma = vracer.policy_apply(rl_cfg, ts, ob)
        else:
            a, mu, sigma = vracer.act(rl_cfg, ts, ob, k)
        was_done = st.done
        st2, ob2, rew, done, _info = jax.vmap(
            lambda s, a_: env.step(consts, s, a_))(st, a)
        out = dict(obs=ob, actions=a, mu=mu, sigma=sigma, rewards=rew,
                   mask=jnp.asarray(~was_done, ob.dtype))
        return (st2, ob2), out

    roll_keys = jax.random.split(k_roll, env.episode_length)
    (final_state, _), traj = jax.lax.scan(macro, (state, obs), roll_keys)
    # (T, B, ...) -> (B, T, ...)
    traj = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), traj)
    return traj, final_state


def zero_action_episode(env: Env, key, batch_size: int = 1, episode_base=0,
                        consts=None):
    """The reference's korali-free smoke loop (tests/burger/loop.py:99-135):
    run a full episode with zero actions; returns (traj dict, final states)."""
    consts = env.consts if consts is None else consts
    reset_keys = jax.random.split(key, batch_size)
    counts = episode_base + jnp.arange(batch_size)
    state, obs = jax.vmap(lambda k, c: env.reset(consts, k, c))(reset_keys, counts)
    zero = jnp.zeros((batch_size, env.num_agents, env.act_dim), obs.dtype)

    def macro(carry, _):
        st, ob = carry
        st2, ob2, rew, done, _info = jax.vmap(
            lambda s, a_: env.step(consts, s, a_))(st, zero)
        return (st2, ob2), dict(obs=ob, rewards=rew, done=done)

    (final_state, _), traj = jax.lax.scan(macro, (state, obs), None,
                                          length=env.episode_length)
    traj = jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), traj)
    return traj, final_state
