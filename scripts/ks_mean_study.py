"""KS mean-score study over a 16-realization DNS pool (round-5, step 4).

ks_gain_mean.py showed the single-episode-optimized gains LOSE on average
(4/16 wins, mean -0.0165 vs uncontrolled -0.0077): 17 parameters polished on
one chaos-dominated draw overfit it.  This script settles what IS attainable
on average at the reference N=32 operating point:

  1. oracle@macro per row — the exact SGS forcing Pi computed from each
     row's OWN DNS (no fitting; through the realizable action channel:
     clip(irfft(Pi_hat), +-5) as actions via the hat basis).  If this loses
     on average too, even DNS-informed forcing has no mean headroom at the
     macro-step protocol.
  2. robust hyperviscosity scan — e4 in a 1-D grid, objective = MEAN score
     over training rows 0..7, winner evaluated on held-out rows 8..15.
     If no e4 improves the held-out mean, no state-feedback policy of this
     (dominant) family robustly beats the baseline at N=32.

fp64 CPU.  Writes results/ks_mean_study_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from marlpde_tpu.envs import ks_env  # noqa: E402

N_POOL = 16
GRID = int(os.environ.get("KS_STUDY_GRID", 32))


def build():
    cfg = ks_env.KSEnvConfig(grid_size=GRID, num_actions=GRID)
    pool = ks_env.make_dns_pool(
        cfg, N_POOL,
        dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    return cfg, pool


def make_episode(cfg):
    g = cfg.grid_size
    N = cfg.N_dns
    kc = jnp.asarray(np.fft.rfftfreq(g, cfg.L / (2 * np.pi * g)))
    gk_c = -0.5j * kc

    @partial(jax.jit, static_argnums=(3,))
    def episode(pool, sidx, gains, mode):
        """mode: 0 uncontrolled, 1 gain feedback, 2 oracle@macro."""
        st, _ = ks_env.reset(cfg, pool, jax.random.key(0), sidx)
        n_int = cfg.n_intermediate

        def macro(carry, m):
            st = carry
            if mode == 0:
                a = jnp.zeros(cfg.num_actions, st.solver.u.dtype)
            elif mode == 1:
                rv = jnp.fft.rfft(st.solver.u)
                a = jnp.clip(jnp.fft.irfft(gains * rv, g), -5.0, 5.0)
            else:
                # exact SGS forcing from this row's DNS frame at macro start
                u_dns = pool.uu[sidx, m * n_int]
                rvd = jnp.fft.rfft(u_dns)
                ub = jnp.fft.irfft(rvd[: g // 2 + 1] * (g / N), g)
                u2b = jnp.fft.rfft(u_dns ** 2)[: g // 2 + 1] * (g / N)
                pi_hat = gk_c * (u2b - jnp.fft.rfft(ub * ub))
                a = jnp.clip(jnp.fft.irfft(pi_hat, g), -5.0, 5.0)
            st, _, rew, _, _ = ks_env.step(cfg, pool, st, a)
            return st, rew[0]

        _, rews = jax.lax.scan(macro, st, jnp.arange(cfg.episode_length))
        return rews.sum()

    return episode


def main():
    print(f"[mean_study] building {N_POOL}-row pool (fp64 host DNS)...",
          flush=True)
    cfg, pool = build()
    episode = make_episode(cfg)
    half = cfg.grid_size // 2 + 1
    k = np.fft.rfftfreq(cfg.grid_size, cfg.L / (2 * np.pi * cfg.grid_size))
    zero = jnp.zeros(half, pool.uu.dtype)

    base = np.array([float(episode(pool, jnp.asarray(i), zero, 0))
                     for i in range(N_POOL)])
    orac = np.array([float(episode(pool, jnp.asarray(i), zero, 2))
                     for i in range(N_POOL)])
    d_o = orac - base
    print(f"[mean_study] uncontrolled mean {base.mean():+.5f}", flush=True)
    print(f"[mean_study] oracle@macro mean {orac.mean():+.5f} "
          f"improvement {d_o.mean():+.5f} +- "
          f"{d_o.std(ddof=1) / np.sqrt(N_POOL):.5f} "
          f"({int((d_o > 0).sum())}/{N_POOL} wins)", flush=True)

    # robust-e4 scan: train rows 0..7, held-out rows 8..15
    train_rows, test_rows = range(8), range(8, 16)
    scan = {}
    for e4 in (-0.004, -0.002, -0.001, -0.0005, 0.0005, 0.001, 0.002, 0.004):
        gains = jnp.asarray(e4 * k ** 4, pool.uu.dtype)
        tr = np.array([float(episode(pool, jnp.asarray(i), gains, 1))
                       for i in train_rows])
        scan[e4] = tr.mean()
        print(f"[mean_study] e4={e4:+.4f} train-mean {tr.mean():+.5f} "
              f"(base {base[:8].mean():+.5f})", flush=True)
    best_e4 = max(scan, key=scan.get)
    out_rows = {}
    if scan[best_e4] > base[:8].mean():
        gains = jnp.asarray(best_e4 * k ** 4, pool.uu.dtype)
        te = np.array([float(episode(pool, jnp.asarray(i), gains, 1))
                       for i in test_rows])
        d_t = te - base[8:]
        out_rows = dict(best_e4=best_e4,
                        heldout_mean=float(te.mean()),
                        heldout_base=float(base[8:].mean()),
                        heldout_improvement=float(d_t.mean()),
                        heldout_wins=int((d_t > 0).sum()))
        print(f"[mean_study] best e4={best_e4:+.4f} held-out mean "
              f"{te.mean():+.5f} vs base {base[8:].mean():+.5f} "
              f"({out_rows['heldout_wins']}/8 wins)", flush=True)
    else:
        print("[mean_study] NO e4 beats the train-row mean — no robust "
              "hyperviscosity improvement exists at N=32", flush=True)

    out = dict(uncontrolled=base.tolist(), oracle=orac.tolist(),
               oracle_mean_improvement=float(d_o.mean()),
               oracle_sem=float(d_o.std(ddof=1) / np.sqrt(N_POOL)),
               oracle_wins=int((d_o > 0).sum()),
               e4_scan={str(kk): float(v) for kk, v in scan.items()},
               robust_e4=out_rows)
    with open(f"results/ks_mean_study_g{GRID}_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"[mean_study] wrote results/ks_mean_study_g{GRID}_r5.json", flush=True)


if __name__ == "__main__":
    main()
