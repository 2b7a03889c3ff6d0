"""Mean-score evaluation of the KS hyperviscosity-gain policy over a
16-realization DNS pool (round-5 KS item, step 3).

ks_env_opt.py optimized per-mode gains on ONE DNS episode.  The deterministic
single-episode spectral score is chaos-dominated: an O(1e-11) action
perturbation decorrelates the trajectory mid-episode and moves the score by
~+-0.01 (measured: the same policy scored -0.0018 under apg's squash and
-0.0170 under the test harness's clip — identical to 7 digits per step).  Any
claim of beating the uncontrolled baseline must therefore be about the MEAN
over independent DNS realizations, not one draw.

This script builds a 16-row pool (seeds [42, i], the env's own convention),
rolls uncontrolled and gain-policy episodes on every row, and reports
mean +- sem and the per-row sign pattern.  fp64 CPU.

Writes results/ks_gain_mean_r5.json.
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


def main():
    cfg = ks_env.KSEnvConfig()
    print(f"[gain_mean] building {N_POOL}-row pool (fp64 host DNS)...",
          flush=True)
    pool = ks_env.make_dns_pool(cfg, N_POOL, dtype=jnp.float64)

    with open("results/ks_env_opt_r5.json") as f:
        gains = jnp.asarray(json.load(f)["per_mode"]["gains"], jnp.float64)

    @partial(jax.jit, static_argnums=2)
    def episode(pool, sidx, controlled):
        st, _ = ks_env.reset(cfg, pool, jax.random.key(0), sidx)

        def macro(carry, _):
            st = carry
            if controlled:
                rv = jnp.fft.rfft(st.solver.u)
                a = jnp.clip(jnp.fft.irfft(gains * rv, cfg.grid_size),
                             -5.0, 5.0)
            else:
                a = jnp.zeros(cfg.num_actions, st.solver.u.dtype)
            st, _, rew, _, _ = ks_env.step(cfg, pool, st, a)
            return st, rew[0]

        _, rews = jax.lax.scan(macro, st, None, length=cfg.episode_length)
        return rews.sum()

    rows = []
    for i in range(N_POOL):
        b = float(episode(pool, jnp.asarray(i), False))
        c = float(episode(pool, jnp.asarray(i), True))
        rows.append(dict(sidx=i, uncontrolled=b, controlled=c, win=c > b))
        print(f"[gain_mean] row {i:2d}: uncontrolled {b:+.5f} "
              f"controlled {c:+.5f} {'WIN' if c > b else 'loss'}", flush=True)

    b = np.array([r["uncontrolled"] for r in rows])
    c = np.array([r["controlled"] for r in rows])
    d = c - b
    out = dict(rows=rows,
               mean_uncontrolled=float(b.mean()),
               mean_controlled=float(c.mean()),
               mean_improvement=float(d.mean()),
               sem_improvement=float(d.std(ddof=1) / np.sqrt(len(d))),
               wins=int((d > 0).sum()), n=len(d))
    print(f"[gain_mean] mean uncontrolled {b.mean():+.5f}  "
          f"mean controlled {c.mean():+.5f}  improvement "
          f"{d.mean():+.5f} +- {out['sem_improvement']:.5f} "
          f"({out['wins']}/{len(d)} wins)", flush=True)
    with open("results/ks_gain_mean_r5.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
