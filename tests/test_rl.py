"""RL-layer tests: distributions, V-trace, replay, normalizers, and a
learning smoke test on the diffusion-simple workload (the reference's minimum
end-to-end slice, SURVEY.md §7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from marlpde_tpu.envs import registry
from marlpde_tpu.rl import distributions as D
from marlpde_tpu.rl import replay, running_stats, vracer
from marlpde_tpu.train import trainer


class TestClippedNormal:
    def test_interior_log_prob_matches_scipy(self, rng):
        a = rng.uniform(-4, 4, 32)
        mu = rng.standard_normal(32)
        sigma = rng.uniform(0.5, 2.0, 32)
        got = np.asarray(D.log_prob(jnp.asarray(a), jnp.asarray(mu),
                                    jnp.asarray(sigma), -5.0, 5.0))
        want = stats.norm.logpdf(a, mu, sigma)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_boundary_masses(self):
        # at the bounds the density is the clipped tail mass
        got_lo = float(D.log_prob(jnp.asarray(-5.0), jnp.asarray(0.0),
                                  jnp.asarray(2.0), -5.0, 5.0))
        np.testing.assert_allclose(got_lo, stats.norm.logcdf(-2.5), rtol=1e-10)
        got_hi = float(D.log_prob(jnp.asarray(5.0), jnp.asarray(1.0),
                                  jnp.asarray(2.0), -5.0, 5.0))
        np.testing.assert_allclose(got_hi, stats.norm.logsf(2.0), rtol=1e-10)

    def test_samples_respect_bounds_and_distribution(self):
        key = jax.random.key(0)
        s = D.sample(key, jnp.zeros(20000), jnp.full(20000, 3.0), -2.0, 2.0)
        s = np.asarray(s)
        assert s.min() >= -2.0 and s.max() <= 2.0
        # clipped mass at bounds ~ Phi(-2/3) each
        frac_lo = (s == -2.0).mean()
        assert abs(frac_lo - stats.norm.cdf(-2 / 3)) < 0.02

    def test_kl_normal_zero_for_identical(self):
        mu = jnp.asarray([[0.5, -1.0]])
        sig = jnp.asarray([[1.0, 2.0]])
        assert float(D.kl_normal(mu, sig, mu, sig)[0]) == pytest.approx(0.0)

    def test_kl_normal_matches_formula(self):
        got = float(D.kl_normal(jnp.asarray([0.0]), jnp.asarray([1.0]),
                                jnp.asarray([1.0]), jnp.asarray([2.0])))
        want = np.log(2.0) + (1.0 + 1.0) / 8.0 - 0.5
        np.testing.assert_allclose(got, want, rtol=1e-7)


class TestVtrace:
    def test_on_policy_reduces_to_discounted_returns(self, rng):
        T, gamma = 6, 0.9
        r = rng.standard_normal(T)
        V = rng.standard_normal(T)
        mask = np.ones(T)
        vtg, adv = vracer._vtrace(jnp.asarray(V)[None], jnp.asarray(r)[None],
                                  jnp.ones((1, T)), jnp.asarray(mask)[None], gamma)
        want = np.zeros(T)
        acc = 0.0
        for t in reversed(range(T)):
            acc = r[t] + gamma * acc
            want[t] = acc
        np.testing.assert_allclose(np.asarray(vtg)[0], want, rtol=1e-6)
        # advantage = r + gamma*vtg_{t+1} - V = vtg_t - V_t on-policy
        np.testing.assert_allclose(np.asarray(adv)[0], want - V, rtol=1e-5, atol=1e-6)

    def test_rho_zero_gives_no_correction(self, rng):
        T = 5
        V = rng.standard_normal(T)
        r = rng.standard_normal(T)
        vtg, _ = vracer._vtrace(jnp.asarray(V)[None], jnp.asarray(r)[None],
                                jnp.zeros((1, T)), jnp.ones((1, T)), 1.0)
        np.testing.assert_allclose(np.asarray(vtg)[0], V, rtol=1e-6)

    def test_mask_stops_bootstrap(self, rng):
        # an episode that ends at t=2 must not bootstrap beyond it
        T = 5
        V = np.ones(T) * 10.0
        r = np.ones(T)
        mask = np.array([1.0, 1.0, 1.0, 0.0, 0.0])
        vtg, _ = vracer._vtrace(jnp.asarray(V)[None], jnp.asarray(r)[None],
                                jnp.ones((1, T)), jnp.asarray(mask)[None], 1.0)
        np.testing.assert_allclose(np.asarray(vtg)[0][:3], [3.0, 2.0, 1.0], rtol=1e-6)


class TestTruncatedBootstrap:
    """Truncated-vs-Terminal episode ends (burger_environment.py:198-204):
    blowup-truncated episodes bootstrap V-trace tails from V(s_T);
    normal ends do not."""

    def test_vtrace_bootstraps_at_last_valid_step(self, rng):
        T, gamma, b = 5, 0.9, 2.5
        r = rng.standard_normal(T)
        V = rng.standard_normal(T)
        mask = np.array([1.0, 1.0, 1.0, 0.0, 0.0])     # episode ends at t=2
        vtg, adv = vracer._vtrace(
            jnp.asarray(V)[None], jnp.asarray(r)[None], jnp.ones((1, T)),
            jnp.asarray(mask)[None], gamma, bootstrap=jnp.asarray([b]))
        # on-policy: vtg = discounted return with V(s_T)=b beyond the end
        want = np.zeros(T)
        acc = b
        for t in reversed(range(3)):
            acc = r[t] + gamma * acc
            want[t] = acc
        np.testing.assert_allclose(np.asarray(vtg)[0][:3], want[:3], rtol=1e-5)
        np.testing.assert_allclose(np.asarray(adv)[0][:3], want[:3] - V[:3],
                                   rtol=1e-4, atol=1e-6)

    def test_zero_bootstrap_matches_no_bootstrap(self, rng):
        T = 4
        V = rng.standard_normal(T)
        r = rng.standard_normal(T)
        mask = np.array([1.0, 1.0, 0.0, 0.0])
        a = vracer._vtrace(jnp.asarray(V)[None], jnp.asarray(r)[None],
                           jnp.ones((1, T)), jnp.asarray(mask)[None], 1.0)
        z = vracer._vtrace(jnp.asarray(V)[None], jnp.asarray(r)[None],
                           jnp.ones((1, T)), jnp.asarray(mask)[None], 1.0,
                           bootstrap=jnp.zeros((1,)))
        for x, y in zip(a, z):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)

    def _mk_batch(self, truncated, final_obs_val=0.7):
        K, T, na, od, ad = 1, 3, 1, 2, 1
        return dict(obs=jnp.zeros((K, T, na, od)),
                    actions=jnp.full((K, T, na, ad), 0.1),
                    mu=jnp.zeros((K, T, na, ad)),
                    sigma=jnp.ones((K, T, na, ad)),
                    rewards=jnp.ones((K, T, na)),
                    mask=jnp.asarray([[1.0, 1.0, 0.0]]),
                    final_obs=jnp.full((K, na, od), final_obs_val),
                    truncated=jnp.asarray([truncated]))

    def test_loss_uses_bootstrap_only_when_truncated(self):
        cfg = vracer.VracerConfig(obs_dim=2, act_dim=1, episode_length=3,
                                  state_rescaling=False,
                                  reward_rescaling=False)
        ts = vracer.init_train(cfg, jax.random.key(1))
        _, m_term = vracer._loss(cfg, ts.params, ts, self._mk_batch(False), 4.0)
        _, m_trunc = vracer._loss(cfg, ts.params, ts, self._mk_batch(True), 4.0)
        # the bootstrap shifts the value targets, hence the value loss
        assert float(m_term["v_loss"]) != float(m_trunc["v_loss"])
        # truncated with a zero-value final obs == terminal IF V(final)==0;
        # here just check both are finite
        assert np.isfinite(float(m_trunc["loss"]))

    def test_loss_finite_with_nan_final_obs(self):
        """Pre-blowup final observations can be NaN/inf (burger env freezes
        the post-blowup field); the learner must sanitize them."""
        cfg = vracer.VracerConfig(obs_dim=2, act_dim=1, episode_length=3,
                                  state_rescaling=False,
                                  reward_rescaling=False)
        ts = vracer.init_train(cfg, jax.random.key(1))
        batch = self._mk_batch(True, final_obs_val=np.nan)
        loss, m = vracer._loss(cfg, ts.params, ts, batch, 4.0)
        assert np.isfinite(float(loss))
        g = jax.grad(lambda p: vracer._loss(cfg, p, ts, batch, 4.0)[0])(ts.params)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))

    def test_collect_tags_blowup_episodes(self):
        """A blowup-prone Burgers config must produce truncated=True episodes
        whose final_obs round-trips through replay."""
        from marlpde_tpu.envs import rollout
        env = registry.make_env(
            "burger", N_dns=64, grid_size=16, num_actions=16, num_agents=4,
            dt=0.01, T=1.0, nu=0.02, episode_length=20, ic_case="turbulence",
            spectral_reward=True, noise=0.0, dforce=False)
        rl_cfg = trainer.default_rl_config(env, width=16, init_noise=5.0)
        ts = vracer.init_train(rl_cfg, jax.random.key(0))
        traj, final = rollout.collect_episodes(env, rl_cfg, ts,
                                               jax.random.key(2), 6)
        assert traj["truncated"].shape == (6,)
        assert traj["final_obs"].shape == (6, 4, env.obs_dim)
        # dforce=False with sigma=5 exploration blows up reliably
        assert bool(np.asarray(traj["truncated"]).any())
        # truncated episodes end early: mask sum < T
        tr = np.asarray(traj["truncated"])
        msum = np.asarray(traj["mask"]).sum(1)
        assert (msum[tr] < env.episode_length).all()
        rep = replay.init(8, env.episode_length, 4, env.obs_dim, env.act_dim)
        rep = replay.add_episodes(rep, traj)
        assert bool(np.asarray(rep.truncated).any())


class TestReplay:
    def test_add_sample_roundtrip(self, rng):
        rep = replay.init(capacity=4, T=3, na=2, obs_dim=5, act_dim=2)
        batch = dict(
            obs=jnp.asarray(rng.standard_normal((2, 3, 2, 5)), jnp.float32),
            actions=jnp.asarray(rng.standard_normal((2, 3, 2, 2)), jnp.float32),
            mu=jnp.zeros((2, 3, 2, 2)), sigma=jnp.ones((2, 3, 2, 2)),
            rewards=jnp.ones((2, 3, 2)), mask=jnp.ones((2, 3)),
            final_obs=jnp.zeros((2, 2, 5)),
            truncated=jnp.asarray([False, True]))
        rep = replay.add_episodes(rep, batch)
        assert int(rep.filled) == 2 and int(rep.cursor) == 2
        out = replay.sample_episodes(rep, jax.random.key(0), 8)
        assert out["obs"].shape == (8, 3, 2, 5)
        assert out["final_obs"].shape == (8, 2, 5)
        assert out["truncated"].shape == (8,)
        assert int(replay.num_experiences(rep)) == 6

    def test_ring_overwrite(self):
        rep = replay.init(capacity=3, T=2, na=1, obs_dim=1, act_dim=1)
        for i in range(5):
            batch = dict(obs=jnp.full((1, 2, 1, 1), float(i)),
                         actions=jnp.zeros((1, 2, 1, 1)),
                         mu=jnp.zeros((1, 2, 1, 1)), sigma=jnp.ones((1, 2, 1, 1)),
                         rewards=jnp.zeros((1, 2, 1)), mask=jnp.ones((1, 2)),
                         final_obs=jnp.zeros((1, 1, 1)),
                         truncated=jnp.zeros((1,), bool))
            rep = replay.add_episodes(rep, batch)
        assert int(rep.filled) == 3
        vals = sorted(float(rep.obs[i, 0, 0, 0]) for i in range(3))
        assert vals == [2.0, 3.0, 4.0]   # oldest (0,1) overwritten


class TestMultiAgentCorrelation:
    def test_joint_rho_is_product_over_agents(self):
        """korali Multi Agent Correlation (run-vracer-burger-marl.py:113):
        the importance weight becomes the product over agents.  With two
        identical agents and one (K=1, T=1) experience, mean_rho under MAC
        must equal mean_rho**2 of the uncorrelated case."""
        kw = dict(obs_dim=1, act_dim=1, num_agents=2, episode_length=1,
                  state_rescaling=False, reward_rescaling=False,
                  action_low=-5.0, action_high=5.0)
        cfg_ind = vracer.VracerConfig(**kw)
        cfg_mac = vracer.VracerConfig(multi_agent_correlation=True, **kw)
        ts = vracer.init_train(cfg_ind, jax.random.key(0))
        batch = dict(obs=jnp.zeros((1, 1, 2, 1)),
                     actions=jnp.full((1, 1, 2, 1), 0.3),
                     mu=jnp.full((1, 1, 2, 1), 0.7),
                     sigma=jnp.full((1, 1, 2, 1), 0.9),
                     rewards=jnp.ones((1, 1, 2)), mask=jnp.ones((1, 1)))
        _, m_ind = vracer._loss(cfg_ind, ts.params, ts, batch, cutoff=1e9)
        _, m_mac = vracer._loss(cfg_mac, ts.params, ts, batch, cutoff=1e9)
        np.testing.assert_allclose(float(m_mac["mean_rho"]),
                                   float(m_ind["mean_rho"]) ** 2, rtol=1e-5)

    def test_single_agent_unchanged(self):
        kw = dict(obs_dim=1, act_dim=1, num_agents=1, episode_length=1,
                  state_rescaling=False, reward_rescaling=False)
        ts = vracer.init_train(vracer.VracerConfig(**kw), jax.random.key(0))
        batch = dict(obs=jnp.zeros((1, 1, 1, 1)),
                     actions=jnp.full((1, 1, 1, 1), 0.3),
                     mu=jnp.full((1, 1, 1, 1), 0.7),
                     sigma=jnp.full((1, 1, 1, 1), 0.9),
                     rewards=jnp.ones((1, 1, 1)), mask=jnp.ones((1, 1)))
        for field in ("loss", "mean_rho"):
            a = vracer._loss(vracer.VracerConfig(**kw), ts.params, ts,
                             batch, cutoff=4.0)[1][field]
            b = vracer._loss(
                vracer.VracerConfig(multi_agent_correlation=True, **kw),
                ts.params, ts, batch, cutoff=4.0)[1][field]
            np.testing.assert_allclose(float(a), float(b), rtol=1e-7)


class TestExperienceMinibatch:
    """korali's uniform-experience sampler (Mini Batch Size = 256,
    run-vracer-burger.py:132) with stored, lazily-refreshed retrace values."""

    def _mk_rep(self, rng, C=4, T=5, na=1, od=3, ad=1, fill=3):
        rep = replay.init(C, T, na, od, ad)
        batch = dict(
            obs=jnp.asarray(rng.standard_normal((fill, T, na, od)), jnp.float32),
            actions=jnp.asarray(rng.standard_normal((fill, T, na, ad)) * 0.1,
                                jnp.float32),
            mu=jnp.zeros((fill, T, na, ad)), sigma=jnp.ones((fill, T, na, ad)),
            rewards=jnp.asarray(rng.standard_normal((fill, T, na)), jnp.float32),
            mask=jnp.asarray(np.stack([[1, 1, 1, 1, 1], [1, 1, 0, 0, 0],
                                       [1, 1, 1, 0, 0]][:fill]), jnp.float32),
            final_obs=jnp.zeros((fill, na, od)),
            truncated=jnp.asarray([False, True, False][:fill]),
            vtg=jnp.asarray(rng.standard_normal((fill, T, na)), jnp.float32),
            boot=jnp.asarray(rng.standard_normal((fill, na)), jnp.float32))
        return replay.add_episodes(rep, batch), batch

    def test_sampler_uniform_over_valid_experiences(self, rng):
        rep, batch = self._mk_rep(rng)
        out = replay.sample_experiences(rep, jax.random.key(0), 4000)
        ep, t = np.asarray(out["ep"]), np.asarray(out["t"])
        mask = np.asarray(batch["mask"])
        # every draw must land on a valid experience
        assert (mask[ep, t] > 0).all()
        # uniformity: each of the 10 valid (ep,t) cells gets ~1/10
        counts = np.zeros_like(mask)
        np.add.at(counts, (ep, t), 1)
        frac = counts[mask > 0] / 4000
        assert abs(frac - 1 / mask.sum()).max() < 0.03

    def test_vtg_next_uses_stored_values_and_bootstrap(self, rng):
        rep, batch = self._mk_rep(rng)
        out = replay.sample_experiences(rep, jax.random.key(1), 512)
        ep, t = np.asarray(out["ep"]), np.asarray(out["t"])
        mask = np.asarray(batch["mask"])
        vtg = np.asarray(batch["vtg"])
        boot = np.asarray(batch["boot"])
        got = np.asarray(out["vtg_next"])
        T = mask.shape[1]
        for i in range(512):
            if t[i] + 1 < T and mask[ep[i], t[i] + 1] > 0:
                want = vtg[ep[i], t[i] + 1]
            else:
                want = boot[ep[i]]
            np.testing.assert_allclose(got[i], want, rtol=1e-6)

    def test_scatter_vtg_roundtrip(self, rng):
        rep, _ = self._mk_rep(rng)
        ep = jnp.asarray([0, 1]); t = jnp.asarray([2, 1])
        new = jnp.asarray([[7.0], [9.0]])
        nb = jnp.asarray([[1.5], [2.5]])
        rep2 = replay.scatter_vtg(rep, ep, t, new, nb)
        assert float(rep2.vtg[0, 2, 0]) == 7.0
        assert float(rep2.vtg[1, 1, 0]) == 9.0
        assert float(rep2.boot[1, 0]) == 2.5

    def test_retrace_values_match_vtrace(self, rng):
        """On-policy insertion retrace == discounted returns (rho=1)."""
        cfg = vracer.VracerConfig(obs_dim=3, act_dim=1, episode_length=5,
                                  gamma=0.9, state_rescaling=False,
                                  reward_rescaling=False)
        ts = vracer.init_train(cfg, jax.random.key(0))
        _, batch = self._mk_rep(rng, fill=2)
        vtg, boot = vracer.retrace_values(cfg, ts, batch)
        assert vtg.shape == (2, 5, 1) and boot.shape == (2, 1)
        # terminal episode (0): no bootstrap; manual check at last step
        V, _, _ = vracer.policy_apply(cfg, ts, batch["obs"])
        r = np.asarray(batch["rewards"])
        Vn = np.asarray(V)
        want_last = Vn[0, 4, 0] + (r[0, 4, 0] - Vn[0, 4, 0])   # rho=1, no boot
        np.testing.assert_allclose(float(vtg[0, 4, 0]), want_last, rtol=1e-5)
        # truncated episode (1, ends at t=1): bootstraps from V(final_obs)
        np.testing.assert_allclose(
            float(vtg[1, 1, 0]),
            r[1, 1, 0] + 0.9 * float(boot[1, 0]), rtol=1e-5)

    def test_training_learns_in_experience_mode(self):
        env = registry.make_env("diffusion-simple", N=8, episode_length=60,
                                noise=0.0)
        rl_cfg = trainer.default_rl_config(
            env, width=32, gamma=0.95, init_noise=3.0, lr=1e-3,
            minibatch_mode="experience", mini_batch_size=128,
            replay_start_experiences=480, replay_max_experiences=48000)
        tc = trainer.TrainerConfig(num_envs=8, max_experiences=24000,
                                   reuse_ratio=64.0, max_updates_per_gen=40,
                                   seed=7, log_every=10)
        ts, rep, hist = trainer.train(env, rl_cfg, tc, verbose=False)
        # diffusion-simple returns sit just below the early-stop threshold
        # (~-5e-5) regardless of skill; survival time is the learning signal
        first = np.mean(hist["mean_ep_len"][:5])
        last = np.mean(hist["mean_ep_len"][-5:])
        assert last > first + 1.0, (first, last)
        assert int(ts.n_updates) > 0

    def test_fused_matches_unfused_experience_mode(self):
        env = registry.make_env("diffusion-simple", N=16, num_agents=1,
                                episode_length=4)
        rl = trainer.default_rl_config(env, width=16,
                                       minibatch_mode="experience",
                                       mini_batch_size=16,
                                       replay_start_experiences=8,
                                       replay_max_experiences=64)
        mk = lambda fused: trainer.TrainerConfig(
            num_envs=2, max_experiences=32, seed=7, fused=fused,
            max_updates_per_gen=4)
        ts_a, rep_a, h_a = trainer.train(env, rl, mk(False), verbose=False)
        ts_b, rep_b, h_b = trainer.train(env, rl, mk(True), verbose=False)
        assert h_a["updates"] == h_b["updates"]
        assert sum(h_b["updates"]) > 0
        for pa, pb in zip(jax.tree.leaves(ts_a.params),
                          jax.tree.leaves(ts_b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(rep_a.vtg), np.asarray(rep_b.vtg),
                                   rtol=1e-5, atol=1e-7)


class TestRunningStats:
    def test_matches_numpy(self, rng):
        rs = running_stats.init((3,))
        data = rng.standard_normal((100, 3)).astype(np.float32)
        for chunk in np.split(data, 4):
            rs = running_stats.update(rs, jnp.asarray(chunk))
        # the accumulator starts with one pseudo-count; tolerance accordingly
        np.testing.assert_allclose(np.asarray(rs.mean), data.mean(0), atol=0.05)
        np.testing.assert_allclose(np.asarray(rs.std), data.std(0), atol=0.1)


class TestRealExperienceAccounting:
    def test_counts_live_steps_and_gates_updates(self):
        """count_real_experiences: total_exp increments by the masked step
        count (korali counts only live experiences — diffusion-simple
        episodes early-stop at cumreward<0 after ~10-20 steps), the replay
        gate opens on real experiences, and updates/gen follow the korali
        economics (new real exp * reuse / minibatch)."""
        env = registry.make_env("diffusion-simple", N=8, episode_length=40,
                                noise=0.5)
        rl_cfg = trainer.default_rl_config(
            env, width=8, gamma=0.95, init_noise=3.0,
            minibatch_mode="experience", mini_batch_size=16,
            replay_start_experiences=30, replay_max_experiences=4000)
        tc = trainer.TrainerConfig(
            num_envs=4, max_experiences=200, reuse_ratio=16.0,
            max_updates_per_gen=50, seed=0, count_real_experiences=True,
            fused=True)   # real mode must force the unfused path
        ts, rep, hist = trainer.train(env, rl_cfg, tc, verbose=False)
        exp = np.asarray(hist["experiences"])
        d_exp = np.diff(np.concatenate([[0], exp]))
        eplen = np.asarray(hist["mean_ep_len"])
        # each generation's increment is the live-step count, not num_envs*T
        np.testing.assert_allclose(d_exp, eplen * tc.num_envs, rtol=1e-6)
        assert exp[-1] < len(exp) * tc.num_envs * env.episode_length
        # korali economics once the gate opens: 1 update per
        # (mini_batch/reuse)=1 new experience, capped at max_updates_per_gen
        upd = np.asarray(hist["updates"])
        cum = np.cumsum(d_exp)
        for i, u in enumerate(upd):
            if cum[i] < rl_cfg.replay_start_experiences:
                assert u == 0, (i, u)
            else:
                assert u == min(tc.max_updates_per_gen, int(d_exp[i])), (i, u)


class TestLearning:
    @pytest.mark.slow
    def test_diffusion_simple_policy_improves(self):
        """The minimum end-to-end slice: VRACER on diffusion-simple must beat
        the random-policy baseline within a small training budget."""
        env = registry.make_env("diffusion-simple", N=8, episode_length=60,
                                noise=0.0)
        rl_cfg = trainer.default_rl_config(
            env, width=32, gamma=0.95, init_noise=3.0, lr=1e-3,
            replay_start_experiences=480, replay_max_experiences=48000,
            mini_batch_episodes=4)
        tc = trainer.TrainerConfig(num_envs=8, max_experiences=24000,
                                   reuse_ratio=64.0, max_updates_per_gen=40,
                                   seed=7, log_every=10)
        ts, rep, hist = trainer.train(env, rl_cfg, tc, verbose=False)
        first = np.mean(hist["mean_return"][:5])
        last = np.mean(hist["mean_return"][-5:])
        assert last > first, (first, last)
        # the learned policy should also survive longer
        assert np.mean(hist["mean_ep_len"][-5:]) > np.mean(hist["mean_ep_len"][:5]) * 0.9

    @pytest.mark.slow
    def test_burger_spectral_closure_learns(self):
        """VRACER on the flagship Burgers spectral-closure workload: the
        cumulative-spectrum error must drop substantially from the random
        policy baseline (observed -0.35 -> -0.06 on this config)."""
        env = registry.make_env(
            "burger", N_dns=64, grid_size=16, num_actions=16, num_agents=1,
            dt=0.01, T=1.0, nu=0.05, episode_length=20, ic_case="turbulence",
            spectral_reward=True, noise=0.0)
        rl_cfg = trainer.default_rl_config(
            env, width=32, lr=1e-3, init_noise=0.5,
            replay_start_experiences=320, replay_max_experiences=16000,
            mini_batch_episodes=4)
        tc = trainer.TrainerConfig(num_envs=16, max_experiences=30000,
                                   reuse_ratio=64.0, max_updates_per_gen=30,
                                   seed=3, log_every=1000)
        ts, rep, hist = trainer.train(env, rl_cfg, tc, verbose=False)
        first = np.mean(hist["mean_return"][:10])
        last = np.mean(hist["mean_return"][-10:])
        assert last > first * 0.6, (first, last)   # >= 40% error reduction


class TestSaveEpisodes:
    """Save Episode custom setting (burger_environment.py:207-238;
    cumreward filter burger_fd_environment.py:211)."""

    def test_training_dumps_filtered_episodes(self, tmp_path):
        from marlpde_tpu.envs import registry
        from marlpde_tpu.train import trainer
        env = registry.make_env("diffusion-simple", N=16, num_agents=1,
                                episode_length=4)
        tc = trainer.TrainerConfig(num_envs=3, max_experiences=24, seed=0,
                                   save_episodes_dir=str(tmp_path / "eps"),
                                   save_episodes_threshold=-np.inf)
        trainer.train(env, None, tc, verbose=False)
        import glob
        files = sorted(glob.glob(str(tmp_path / "eps" / "episodes_gen*.npz")))
        assert files, "no episode dumps written"
        d = np.load(files[0])
        assert d["actions"].shape[1] == 4          # (B_kept, T, na, act)
        assert d["rewards"].shape[1] == 4
        assert d["cumreward"].shape[0] == d["actions"].shape[0]
        # an impossible threshold filters everything
        tc2 = trainer.TrainerConfig(num_envs=2, max_experiences=8, seed=0,
                                    save_episodes_dir=str(tmp_path / "none"),
                                    save_episodes_threshold=1e18)
        trainer.train(env, None, tc2, verbose=False)
        assert not glob.glob(str(tmp_path / "none" / "*.npz"))

    def test_dumps_include_fields_and_spectra(self, tmp_path):
        """The reference npz accumulates solution fields, spectra and pool
        indices (burger_environment.py:207-238: sgs_u, sgs_Ektt, indeces)."""
        from marlpde_tpu.envs import registry
        from marlpde_tpu.train import trainer
        env = registry.make_env(
            "burger", N_dns=64, grid_size=16, num_actions=16, num_agents=4,
            dt=0.01, T=0.5, nu=0.05, episode_length=5, ic_case="turbulence",
            spectral_reward=True, noise=0.0)
        tc = trainer.TrainerConfig(num_envs=2, max_experiences=10, seed=0,
                                   save_episodes_dir=str(tmp_path / "eps"),
                                   save_episodes_threshold=-np.inf)
        trainer.train(env, None, tc, verbose=False)
        import glob
        files = sorted(glob.glob(str(tmp_path / "eps" / "episodes_gen*.npz")))
        assert files
        d = np.load(files[0])
        assert d["fields"].shape == (2, 5, 16)      # sgs_u: (B, T, N)
        assert d["ektt"].shape == (2, 5, 16)        # sgs_Ektt
        assert d["indeces"].shape == (2,)           # DNS pool indices
        assert np.isfinite(d["fields"]).all()


class TestFusedGeneration:
    """Fused one-dispatch generation == unfused loop (same RNG stream)."""

    def test_fused_matches_unfused(self):
        from marlpde_tpu.envs import registry
        from marlpde_tpu.train import trainer
        env = registry.make_env("diffusion-simple", N=16, num_agents=1,
                                episode_length=4)
        rl = trainer.default_rl_config(env, width=16,
                                       replay_start_experiences=8,
                                       replay_max_experiences=64)
        mk = lambda fused: trainer.TrainerConfig(
            num_envs=2, max_experiences=32, seed=7, fused=fused)
        ts_a, rep_a, h_a = trainer.train(env, rl, mk(False), verbose=False)
        ts_b, rep_b, h_b = trainer.train(env, rl, mk(True), verbose=False)
        assert h_a["updates"] == h_b["updates"]
        assert sum(h_b["updates"]) > 0, "updates never ran; test is vacuous"
        np.testing.assert_allclose(
            np.asarray(ts_a.n_updates), np.asarray(ts_b.n_updates))
        for pa, pb in zip(jax.tree.leaves(ts_a.params),
                          jax.tree.leaves(ts_b.params)):
            np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                       rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(h_a["mean_return"], h_b["mean_return"],
                                   rtol=1e-6)


class TestBlowupContainment:
    """-inf blowup rewards (burger_environment.py:200 parity) must not poison
    the learner: reward_floor clamps them inside VRACER only."""

    def test_training_survives_env_blowups(self):
        # dforce=False (actions scaled by d2udx2, Burger.py:445-450) blows up
        # LES under random exploration — exactly the failure seen in training
        env = registry.make_env(
            "burger", N_dns=64, grid_size=16, num_actions=16, num_agents=4,
            dt=0.01, T=1.0, nu=0.02, episode_length=20, ic_case="turbulence",
            spectral_reward=True, noise=0.0, dforce=False)
        rl_cfg = trainer.default_rl_config(
            env, width=16, init_noise=3.0,
            replay_start_experiences=40, replay_max_experiences=4000,
            mini_batch_episodes=2)
        tc = trainer.TrainerConfig(num_envs=4, max_experiences=800,
                                   seed=0, max_updates_per_gen=10)
        ts, rep, hist = trainer.train(env, rl_cfg, tc, verbose=False)
        # some episodes must actually have blown up for this test to bite
        assert min(hist["mean_return"]) == -np.inf
        # ...yet the learner stays finite and the policy keeps acting
        for leaf in jax.tree.leaves(ts.params):
            assert np.all(np.isfinite(np.asarray(leaf)))
        assert hist["mean_ep_len"][-1] > 1.0
        assert int(ts.n_updates) > 0

    def test_reward_floor_disabled_reproduces_poisoning(self):
        env = registry.make_env(
            "burger", N_dns=64, grid_size=16, num_actions=16, num_agents=4,
            dt=0.01, T=1.0, nu=0.02, episode_length=20, ic_case="turbulence",
            spectral_reward=True, noise=0.0, dforce=False)
        rl_cfg = trainer.default_rl_config(
            env, width=16, init_noise=3.0, reward_floor=-np.inf,
            replay_start_experiences=40, replay_max_experiences=4000,
            mini_batch_episodes=2)
        tc = trainer.TrainerConfig(num_envs=4, max_experiences=800,
                                   seed=0, max_updates_per_gen=10)
        ts, rep, hist = trainer.train(env, rl_cfg, tc, verbose=False)
        finite = all(np.all(np.isfinite(np.asarray(l)))
                     for l in jax.tree.leaves(ts.params))
        assert not finite, "expected NaN poisoning with floor disabled"


class TestSigmaMax:
    """Optional exploration-sigma ceiling (networks.VracerNet.sigma_max):
    inf = korali-faithful unbounded; finite = smooth tanh cap."""

    def test_unbounded_default_matches_iex_at_init(self):
        from marlpde_tpu.rl import networks
        net = networks.VracerNet(act_dim=2, width=8, init_noise=0.7)
        obs = jnp.zeros((3, 4))
        p = net.init(jax.random.key(0), obs)
        _, _, sigma = net.apply(p, obs)
        np.testing.assert_allclose(np.asarray(sigma), 0.7, rtol=1e-4)

    def test_cap_bounds_sigma(self, rng):
        from marlpde_tpu.rl import networks
        net = networks.VracerNet(act_dim=2, width=8, init_noise=0.5,
                                 sigma_max=2.0)
        obs = jnp.asarray(rng.standard_normal((64, 4)) * 50)
        p = net.init(jax.random.key(1), obs[:1])
        # inflate the sigma head to force a large raw output
        p = jax.tree.map(lambda a: a * 30.0, p)
        _, _, sigma = net.apply(p, obs)
        assert float(sigma.max()) <= 2.0 + 1e-6
        # small sigmas barely affected: tanh(x)~x
        net2 = networks.VracerNet(act_dim=2, width=8, init_noise=0.1,
                                  sigma_max=10.0)
        p2 = net2.init(jax.random.key(2), obs[:1])
        _, _, s2 = net2.apply(p2, obs)
        np.testing.assert_allclose(np.asarray(s2), 0.1, rtol=1e-3)

    def test_config_threads_through_policy(self):
        cfg = vracer.VracerConfig(obs_dim=4, act_dim=1, width=8,
                                  init_noise=0.3, sigma_max=1.5,
                                  state_rescaling=False)
        ts = vracer.init_train(cfg, jax.random.key(0))
        _, _, sigma = vracer.policy_apply(cfg, ts, jnp.zeros((2, 1, 4)))
        assert float(sigma.max()) <= 1.5


class TestBestCheckpoint:
    def test_best_saved_by_test_return(self, tmp_path):
        from marlpde_tpu.envs import registry
        from marlpde_tpu.utils import checkpoint as ckpt
        env = registry.make_env("diffusion-simple", N=8, episode_length=6,
                                noise=0.0)
        rl = trainer.default_rl_config(env, width=8,
                                       replay_start_experiences=12)
        tc = trainer.TrainerConfig(num_envs=2, max_experiences=60, seed=0,
                                   testing_frequency=1, testing_episodes=2,
                                   checkpoint_dir=str(tmp_path))
        ts, rep, hist = trainer.train(env, rl, tc, verbose=False)
        import json as _json
        assert (tmp_path / "best" / "latest.pkl").exists()
        meta = _json.load(open(tmp_path / "best" / "best.json"))
        assert meta["test_return"] == max(hist["test_return"])
        back = ckpt.load_train_state(str(tmp_path / "best"), rl)
        assert back is not None
