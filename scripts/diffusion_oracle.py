"""Diffusion-simple oracle + SNR measurement (VERDICT r4 Next #4).

Closes the open case on the reference-default diffusion-simple config
(run-vracer-diffusion-simple.py:5-21: N=128, ONE agent owning all 128
stencil actions) with the two numbers the round-4 diagnosis lacked:

A. ORACLE CEILING — the KNOWN exact stencil (deterministic action -2
   everywhere, Diffusion.py:164-206) evaluated on the exact default config:
   the attainable episode-length / return ceiling.  Also: the zero policy
   (the net's init) and a partially-learned stencil (-0.26, run 981's final
   mean) for context.

B. ADVANTAGE-ACTION SNR — over live on-policy episodes from a (briefly)
   trained learner state: per-dimension correlation between the Monte-Carlo
   advantage (return-to-go minus V(s), gamma=0.95) and the per-dimension
   standardized action noise z_d = (a_d - mu_d)/sigma_d.  The pathology-2
   diagnosis (docs/REFER_SCALE.md) predicts |corr_d| ~ (1/sqrt(128)) of an
   already state-dominated signal — indistinguishable from sampling noise at
   practical batch sizes.  The aggregate signal sum_d corr_d * z is what one
   policy-gradient update integrates.

CPU float32 (the training dtype).  Writes results/diffusion_oracle_r5.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from marlpde_tpu.envs import registry, rollout  # noqa: E402
from marlpde_tpu.rl import vracer  # noqa: E402
from marlpde_tpu.train import trainer  # noqa: E402

B = 64          # episodes per evaluation (offset ~ N(0, 0.5) per episode)
GAMMA = 0.95    # run-vracer-diffusion-simple.py:78


def const_action_eval(env, value):
    """Roll B episodes with a constant per-point stencil action."""
    @jax.jit
    def run(keys, counts):
        state, obs = jax.vmap(lambda k, c: env.reset(env.consts, k, c))(
            keys, counts)
        a = jnp.full((B, env.num_agents, env.act_dim), value, jnp.float32)

        def macro(carry, _):
            st, ob = carry
            st2, ob2, rew, done, _ = jax.vmap(
                lambda s, a_: env.step(env.consts, s, a_))(st, a)
            return (st2, ob2), jnp.asarray(~st.done, jnp.float32)

        (fs, _), masks = jax.lax.scan(macro, (state, obs), None,
                                      length=env.episode_length)
        return fs.cum_reward.mean(), masks.sum(0).mean()

    keys = jax.random.split(jax.random.key(0), B)
    ret, eplen = run(keys, jnp.arange(B))
    return float(ret), float(eplen)


def snr_measurement(env, rl_cfg, ts, key, n_episodes=512):
    """Per-dimension advantage-action correlations over fresh on-policy
    episodes collected with the live train state."""
    traj, _ = rollout.collect_episodes(env, rl_cfg, ts, key, n_episodes)
    obs = traj["obs"]                     # (B, T, na, obs)
    mask = np.asarray(traj["mask"])              # (B, T)
    rew = np.asarray(traj["rewards"])[..., 0]    # (B, T)
    z = np.asarray((traj["actions"] - traj["mu"]) / traj["sigma"])[:, :, 0, :]

    V, _, _ = vracer.make_net(rl_cfg).apply(
        ts.params, vracer._prep_obs(rl_cfg, ts, obs))
    V = np.asarray(V)[..., 0]             # (B, T)

    # Monte-Carlo return-to-go, masked (terminal end: no bootstrap)
    T = rew.shape[1]
    G = np.zeros_like(rew)
    acc = np.zeros(rew.shape[0])
    for t in range(T - 1, -1, -1):
        acc = rew[:, t] + GAMMA * acc * mask[:, t]
        G[:, t] = acc
    adv = (G - V)[mask > 0]               # (n,)
    zv = z[mask > 0]                      # (n, 128)
    n = adv.shape[0]
    adv_c = (adv - adv.mean()) / (adv.std() + 1e-12)
    zc = (zv - zv.mean(0)) / (zv.std(0) + 1e-12)
    corr = (zc * adv_c[:, None]).mean(0)  # (128,)
    return dict(n_samples=int(n),
                corr_rms=float(np.sqrt(np.mean(corr ** 2))),
                corr_absmax=float(np.abs(corr).max()),
                corr_mean=float(corr.mean()),
                null_rms=float(1.0 / np.sqrt(n)),
                adv_std=float(adv.std()),
                mean_eplen=float(mask.sum(1).mean()))


def main():
    env = registry.make_env("diffusion-simple")   # exact defaults
    out = {}
    for name, val in (("oracle_-2", -2.0), ("zero", 0.0),
                      ("run981_final_-0.26", -0.26)):
        ret, eplen = const_action_eval(env, val)
        out[name] = dict(mean_return=ret, mean_eplen=eplen)
        print(f"[diffusion_oracle] {name:22s} return {ret:+.5f} "
              f"eplen {eplen:.1f}", flush=True)

    # brief default-config training to get a live learner state
    # (reference economics: width 128, iex 3, gamma 0.95; scale_robust
    # defaults sigma_relative+dimnorm as in run.py)
    rl_cfg = trainer.default_rl_config(
        env, width=128, gamma=GAMMA, init_noise=3.0,
        mu_param="sigma_relative", cutoff_dim_norm=True,
        replay_start_experiences=2048, replay_max_experiences=2 ** 17)
    tc = trainer.TrainerConfig(num_envs=16, max_experiences=20000,
                               fused=True, seed=0,
                               count_real_experiences=False)
    ts, rep, hist = trainer.train(env, rl_cfg, tc, verbose=False)
    print(f"[diffusion_oracle] trained {hist['gen'][-1]} gens, "
          f"eplen {hist['mean_ep_len'][-1]:.1f}", flush=True)

    for tag, state, kseed in (("trained", ts, 1), ("init", vracer.init_train(
            rl_cfg, jax.random.key(9)), 2)):
        m = snr_measurement(env, rl_cfg, state, jax.random.key(kseed))
        out[f"snr_{tag}"] = m
        print(f"[diffusion_oracle] SNR[{tag}]: corr_rms {m['corr_rms']:.5f} "
              f"(null {m['null_rms']:.5f}) absmax {m['corr_absmax']:.5f} "
              f"n={m['n_samples']}", flush=True)

    os.makedirs("results", exist_ok=True)
    with open("results/diffusion_oracle_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("[diffusion_oracle] wrote results/diffusion_oracle_r5.json",
          flush=True)


if __name__ == "__main__":
    main()
