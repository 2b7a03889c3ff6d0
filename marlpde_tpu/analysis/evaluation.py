"""Policy evaluation sweeps: the burger_testing_environment.py equivalent.

Parity target: burger_testing_environment.py — loop over the whole DNS pool
with the deterministic policy, collect (i) spectral relative-error
trajectories, (ii) learned action fields, (iii) DNS-derived a-priori SGS
terms; dump relError_*.npy / sgsTerms_*.npy / dnsSgsTerms_*.npy (:168-179).
Also the uncontrolled-baseline comparison + makePlot of the single-episode
testing branch (burger_environment.py:241-329).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from marlpde_tpu.analysis import diagnostics, plotting
from marlpde_tpu.core import spectral
from marlpde_tpu.envs import burger_env
from marlpde_tpu.rl import vracer


def _episode_with_policy(cfg, pool, rl_cfg, ts, key, sidx, deterministic=True):
    """One episode on DNS pool row sidx; returns stacked per-macro-step data."""
    state, obs = burger_env.reset(cfg, pool, key, sidx)

    def macro(carry, k):
        st, ob = carry
        if deterministic:
            a = vracer.act_deterministic(rl_cfg, ts, ob)
        else:
            a, _, _ = vracer.act(rl_cfg, ts, ob, k)
        st2, ob2, rew, done, _ = burger_env.step(cfg, pool, st, a)
        count = (st2.solver.ioutnum + 1).astype(st2.solver.u.dtype)
        out = dict(u=st2.solver.u, actions=a, reward=rew,
                   rel_err=st2.prev_rel_err,
                   ektt=st2.ek_sum / count)
        return (st2, ob2), out

    keys = jax.random.split(key, cfg.episode_length)
    (final, _), traj = jax.lax.scan(macro, (state, obs), keys)
    return traj, final


def evaluate_policy(cfg: burger_env.BurgerEnvConfig, pool, rl_cfg, ts,
                    out_dir: str = None, run_tag: int = 0, key=None,
                    make_plots: bool = False):
    """Sweep every DNS in the pool with the deterministic policy.

    Returns dict with relError (P, T), actions (P, T, NA), cumreward (P, na),
    dnsSgsTerms (P, T+1, g); writes the reference's .npy dumps when out_dir
    is given (burger_testing_environment.py:168-179)."""
    key = key if key is not None else jax.random.key(0)
    n_pool = int(pool.nu.shape[0])
    ep = jax.jit(lambda p, t, k, i: _episode_with_policy(cfg, p, rl_cfg, t, k, i))

    rel_errs, actions, cums = [], [], []
    for i in range(n_pool):
        key, k = jax.random.split(key)
        traj, final = ep(pool, ts, k, jnp.asarray(i))
        rel_errs.append(np.asarray(traj["rel_err"]))
        actions.append(np.asarray(traj["actions"]).reshape(cfg.episode_length, -1))
        cums.append(np.asarray(final.cum_reward))

    # DNS a-priori SGS terms (burger_environment.py:244)
    dcfg = cfg.dns_solver
    dns_sgs = []
    for i in range(n_pool):
        terms = diagnostics.compute_sgs_burger(
            pool.uu[i], dcfg.grid.k, dcfg.grid.dx, cfg.dt,
            float(pool.nu[i]), cfg.grid_size)
        dns_sgs.append(np.asarray(terms["sgs_alt2"]))

    out = dict(relError=np.stack(rel_errs), actions=np.stack(actions),
               cumreward=np.stack(cums), dnsSgsTerms=np.stack(dns_sgs))
    if out_dir:
        from marlpde_tpu.utils.async_sink import AsyncSink
        sink = AsyncSink(out_dir)
        sink.write(f"relError_{run_tag}", out["relError"])
        sink.write(f"sgsTerms_{run_tag}", out["actions"])
        sink.write(f"dnsSgsTerms_{run_tag}", out["dnsSgsTerms"])
        sink.flush()
    return out


def compare_with_uncontrolled(cfg: burger_env.BurgerEnvConfig, pool, rl_cfg, ts,
                              key=None, sidx: int = 0, file_prefix: str = None):
    """The testing-mode branch (burger_environment.py:241-329): run the
    controlled episode AND a zero-action baseline; optionally makePlot."""
    key = key if key is not None else jax.random.key(0)
    traj_c, final_c = jax.jit(
        lambda p, t, k: _episode_with_policy(cfg, p, rl_cfg, t, k,
                                             jnp.asarray(sidx)))(pool, ts, key)

    def zero_episode(p, k):
        state, obs = burger_env.reset(cfg, p, k, jnp.asarray(sidx))

        def macro(carry, _):
            st, ob = carry
            a = jnp.zeros((cfg.num_agents, cfg.actions_per_agent), st.solver.u.dtype)
            st2, ob2, rew, done, _ = burger_env.step(cfg, p, st, a)
            return (st2, ob2), dict(u=st2.solver.u, reward=rew,
                                    rel_err=st2.prev_rel_err)

        (final, _), traj = jax.lax.scan(macro, (state, obs), None,
                                        length=cfg.episode_length)
        return traj, final

    traj_b, final_b = jax.jit(zero_episode)(pool, key)

    result = dict(
        controlled_cumreward=np.asarray(final_c.cum_reward),
        baseline_cumreward=np.asarray(final_b.cum_reward),
        controlled_rel_err=np.asarray(traj_c["rel_err"]),
        baseline_rel_err=np.asarray(traj_b["rel_err"]))

    if file_prefix:
        dcfg, lcfg = cfg.dns_solver, cfg.les_solver
        tt = np.arange(cfg.episode_length) * cfg.dt * cfg.n_intermediate
        dns_ek = diagnostics.compute_ek(spectral.fft(pool.uu[sidx]), dcfg.grid.dx)
        sub = cfg.n_intermediate
        dns = dict(x=dcfg.grid.x, tt=np.arange(pool.uu.shape[1]) * cfg.dt,
                   uu=np.asarray(pool.uu[sidx]),
                   ek_t=np.asarray(dns_ek["Ek_t"]), ek_ktt=np.asarray(dns_ek["Ek_ktt"]))
        mk = lambda tr: dict(x=lcfg.grid.x, tt=tt, uu=np.asarray(tr["u"]),
                             ek_t=np.asarray(tr["ektt"]).sum(-1)
                             if "ektt" in tr else np.zeros(len(tt)),
                             ek_ktt=np.asarray(tr.get("ektt", np.zeros((len(tt), cfg.grid_size)))),
                             action_fields=np.asarray(tr.get("actions", np.zeros((len(tt), 1)))).reshape(len(tt), -1))
        plotting.make_plot(dns, mk(traj_b), mk(traj_c), file_prefix,
                           cfg.spectral_reward)
    return result
