"""64-realization evaluation of the KS run-925 policy (round-5 item 1,
final verdict).

The single-episode KS spectral score is chaos noise (docs/REFER_SCALE.md
round 5): even two XLA compilations of the SAME deterministic episode land
on different draws (run 925 best checkpoint: trainer.evaluate mean -0.0185
vs ks_testing re-rollout -0.0474 over the same 8-16 rows).  A defensible
controlled-vs-uncontrolled verdict needs enough independent draws for the
SEM to resolve the gap.

This script builds a 64-row DNS pool (rows [seed,i] — rows 0..15 are the
TRAINING distribution of run 925, rows 16..63 are held out), rolls the
uncontrolled baseline, the 925 best-checkpoint policy, and the fixed
e4=-5e-4 hyperviscosity feedback (the mean-study reference) on every row,
and reports means +- sem for the training rows, the held-out rows, and all.

CPU fp32 (the training dtype).  Writes results/ks_eval64_r5.json.
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
from marlpde_tpu.rl import vracer  # noqa: E402
from marlpde_tpu.train import trainer  # noqa: E402
from marlpde_tpu.utils import checkpoint as ckpt  # noqa: E402

N_POOL = 64


def main():
    cfg = ks_env.KSEnvConfig(grid_size=16, num_actions=16)
    print(f"[eval64] building {N_POOL}-row pool...", flush=True)
    pool = ks_env.make_dns_pool(cfg, N_POOL, dtype=jnp.float32)

    from marlpde_tpu.envs import registry
    env = registry.make_env("ks", cfg=cfg, pool=pool)
    rl_cfg = trainer.default_rl_config(
        env, width=256, init_noise=0.01, mu_param="sigma_relative",
        cutoff_dim_norm=True)
    ckpt_dir = os.environ.get("KS_EVAL_CKPT", "_result_ks_925/best")
    ts = ckpt.load_train_state(ckpt_dir, rl_cfg)
    assert ts is not None

    k = np.fft.rfftfreq(16, cfg.L / (2 * np.pi * 16))
    gains = jnp.asarray(-5e-4 * k ** 4, jnp.float32)

    @partial(jax.jit, static_argnums=1)
    def episode(sidx, mode):
        st, obs = ks_env.reset(cfg, pool, jax.random.key(0), sidx)

        def macro(carry, _):
            st, ob = carry
            if mode == 0:
                a = jnp.zeros(cfg.num_actions, st.solver.u.dtype)
            elif mode == 1:
                a = vracer.act_deterministic(rl_cfg, ts, ob)[0]
            else:
                rv = jnp.fft.rfft(st.solver.u)
                a = jnp.clip(jnp.fft.irfft(gains * rv, 16), -5.0, 5.0)
            st, ob, rew, _, _ = ks_env.step(cfg, pool, st, a)
            return (st, ob), rew[0]

        (_, _), rews = jax.lax.scan(macro, (st, obs), None,
                                    length=cfg.episode_length)
        return rews.sum()

    tag = os.environ.get("KS_EVAL_TAG", "policy_925_best")
    names = {0: "uncontrolled", 1: tag, 2: "e4_feedback"}
    scores = {v: np.array([float(episode(jnp.asarray(i), m))
                           for i in range(N_POOL)])
              for m, v in names.items()}

    def block(sel, label):
        out = {}
        for v, s in scores.items():
            x = s[sel]
            out[v] = dict(mean=float(x.mean()),
                          sem=float(x.std(ddof=1) / np.sqrt(len(x))))
        d = scores[tag][sel] - scores["uncontrolled"][sel]
        out["policy_improvement"] = dict(
            mean=float(d.mean()), sem=float(d.std(ddof=1) / np.sqrt(len(d))),
            wins=int((d > 0).sum()), n=int(len(d)))
        print(f"[eval64] {label}: " + "  ".join(
            f"{v} {out[v]['mean']:+.5f}+-{out[v]['sem']:.5f}"
            for v in names.values()) +
            f"  wins {out['policy_improvement']['wins']}/{len(d)}", flush=True)
        return out

    res = dict(train_rows=block(slice(0, 16), "train rows 0-15"),
               heldout_rows=block(slice(16, 64), "held-out rows 16-63"),
               all_rows=block(slice(0, 64), "all rows"))
    out_name = os.environ.get("KS_EVAL_OUT", "results/ks_eval64_r5.json")
    with open(out_name, "w") as f:
        json.dump(res, f, indent=1)
    print(f"[eval64] wrote {out_name}", flush=True)


if __name__ == "__main__":
    main()
