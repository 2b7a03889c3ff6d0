"""Attribute the burger-fd bench's per-macro-step cost on the TPU.

BENCH_FD_r4 measured 94.7k substeps/s at B=2048 — ~300x below the spectral
flagship per substep — while the bytes-accessed roofline allows ~100x more.
This probe times the macro step with pieces knocked out to find the hot op:

  full        : env.step as benched (10 substeps, MSE reward each substep)
  no_reward   : _mse_rewards monkeypatched to zeros (isolates the per-substep
                cubic-spline interpolation + pool frame gathers)
  no_obs      : observation gather knocked out (halo featurization)
  solver_only : both knocked out — raw FD substeps + basis matmul

Run on the chip:  python scripts/tpu_fd_profile.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from marlpde_tpu.envs import burger_env, registry

B = int(os.environ.get("PROBE_ENVS", 2048))
MACRO = int(os.environ.get("PROBE_MACRO", 20))


def build():
    return registry.make_env(
        "burger-fd", N_dns=1024, grid_size=256, num_actions=256,
        num_agents=1, dt=0.001, T=5.0, nu=0.02, episode_length=500,
        ic_case="turbulence", spectral_reward=False, noise=0.0,
        dtype=jnp.float32)


def time_variant(name, env, st, acts):
    def macro_scan(state):
        def body(s, _):
            s2, _obs, _r, _d, _info = env.step(env.consts, s, acts[0])
            return s2, None
        out, _ = jax.lax.scan(body, state, None, length=MACRO)
        return out

    f = jax.jit(jax.vmap(macro_scan))
    out = f(st)
    float(jax.tree.leaves(out.solver.u if hasattr(out, "solver") else out)[0][0, 0])  # D2H barrier
    t0 = time.perf_counter()
    out = f(st)
    float(jax.tree.leaves(out.solver.u if hasattr(out, "solver") else out)[0][0, 0])
    dt = time.perf_counter() - t0
    sub = B * MACRO * env.cfg.n_intermediate
    print(f"[fd-profile] {name:12s} {dt*1e3:9.1f} ms  ->  {sub/dt/1e3:10.1f}k substeps/s",
          flush=True)
    return dt


def main():
    env = build()
    keys = jax.random.split(jax.random.key(1), B)
    st, _obs = jax.jit(jax.vmap(lambda k: env.reset(env.consts, k, 0)))(keys)
    acts = jnp.zeros((1, 1, 256))
    print(f"[fd-profile] devices={jax.devices()} B={B} macro={MACRO} "
          f"nint={env.cfg.n_intermediate}", flush=True)

    time_variant("full", env, st, acts)

    real_mse = burger_env._mse_rewards
    real_obs = burger_env._observe
    try:
        burger_env._mse_rewards = lambda cfg, pool, sidx, sol: jnp.zeros(
            (cfg.num_agents,), sol.u.dtype)
        time_variant("no_reward", env, st, acts)
        burger_env._observe = lambda cfg, state: jnp.zeros(
            (cfg.num_agents, cfg.obs_dim), state.solver.u.dtype)
        time_variant("no_rew_obs", env, st, acts)
    finally:
        burger_env._mse_rewards = real_mse
        burger_env._observe = real_obs


if __name__ == "__main__":
    main()
