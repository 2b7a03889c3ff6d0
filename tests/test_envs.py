"""Environment-layer tests: episode protocol, rewards, featurization.

The zero-action episode loop is the reference's own korali-free test pattern
(tests/burger/loop.py:99-135).  Oracles re-derive the full reference episode
logic (burger_environment.py) in numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlpde_tpu.envs import burger_env, diffusion_env, features, registry, rollout
from tests.test_solvers import np_abcn_simulate


def np_ek_kt(vv, N, dx):
    return 0.5 * np.real(np.conj(vv) * vv) / N * dx


class TestBurgerEnvSpectral:
    def _run_oracle(self, N_dns, g, L, dt, T, ep_len, nu, seed):
        """Literal re-derivation of the spectral-reward episode
        (burger_environment.py:109-176) with zero actions.  Turbulence IC so
        every mode carries energy (a sinus IC makes the *relative* spectral
        error a ratio of roundoff noise at the empty modes)."""
        from marlpde_tpu.core import ic as ic_mod
        nsteps = int(T / dt)
        nint = nsteps // ep_len
        x = np.linspace(0, L, N_dns, endpoint=False)
        u0 = np.asarray(ic_mod.burger_turbulence(seed, 0.0, jnp.asarray(x), L))
        dns_uu = np_abcn_simulate(u0, N_dns, L, dt, nu, nsteps)
        dns_vv = np.fft.fft(dns_uu, axis=-1)
        dns_ek = np_ek_kt(dns_vv, N_dns, L / N_dns)
        dns_ektt = np.cumsum(dns_ek, 0) / np.arange(1, nsteps + 2)[:, None]
        # IC transplant: spectral restriction (offset 0)
        v0 = np.concatenate((dns_vv[0][:(g + 1) // 2], dns_vv[0][-(g - 1) // 2:])) * g / N_dns
        les_u0 = np.real(np.fft.ifft(v0))
        les_uu = np_abcn_simulate(les_u0, g, L, dt, nu, nsteps)
        les_vv = np.fft.fft(les_uu, axis=-1)
        les_ek = np_ek_kt(les_vv, g, L / g)
        les_ektt = np.cumsum(les_ek, 0) / np.arange(1, nsteps + 2)[:, None]
        rewards, prev = [], 0.0
        for s in range(1, ep_len + 1):
            i = s * nint
            err = np.mean((np.abs(dns_ektt[i, 1:g // 2] - les_ektt[i, 1:g // 2])
                           / dns_ektt[i, 1:g // 2]) ** 2)
            rewards.append(prev - err)
            prev = err
        return np.array(rewards), les_uu

    def test_zero_action_episode_matches_oracle(self):
        N_dns, g, L, dt, T, ep_len, nu = 64, 16, 2 * np.pi, 0.01, 0.5, 10, 0.05
        seed = 42
        cfg = burger_env.BurgerEnvConfig(
            N_dns=N_dns, grid_size=g, num_actions=g, L=L, dt=dt, T=T, nu=nu,
            episode_length=ep_len, ic_case="turbulence", seed=seed,
            spectral_reward=True, noise=0.0)
        env = registry.make_env("burger", cfg=cfg, dtype=jnp.float64)
        traj, final = rollout.zero_action_episode(env, jax.random.key(0))
        got_rewards = np.asarray(traj["rewards"][0, :, 0])
        want_rewards, want_uu = self._run_oracle(N_dns, g, L, dt, T, ep_len, nu, seed)
        np.testing.assert_allclose(got_rewards, want_rewards, atol=1e-9)
        np.testing.assert_allclose(np.asarray(final.solver.u[0]), want_uu[-1], atol=1e-9)

    def test_restriction_ic_matches_oracle(self):
        N_dns, g = 64, 16
        cfg = burger_env.BurgerEnvConfig(
            N_dns=N_dns, grid_size=g, num_actions=g, dt=0.01, T=0.5, nu=0.05,
            episode_length=10, ic_case="sinus", spectral_reward=True, noise=0.0)
        pool = burger_env.make_dns_pool(cfg, 1, dtype=jnp.float64)
        st, obs = burger_env.reset(cfg, pool, jax.random.key(1), 0)
        v0_dns = np.asarray(pool.v0[0])
        want = np.concatenate((v0_dns[:(g + 1) // 2], v0_dns[-(g - 1) // 2:])) * g / N_dns
        np.testing.assert_allclose(np.asarray(st.solver.v), want, atol=1e-10)


class TestBurgerEnvMse:
    def test_same_grid_zero_action_gives_zero_mse(self):
        # gridSize == N_dns, offset 0: the LES *is* the DNS, so the truth
        # interpolant evaluates at its own nodes and the MSE reward vanishes.
        cfg = burger_env.BurgerEnvConfig(
            N_dns=32, grid_size=32, num_actions=32, dt=0.01, T=0.5, nu=0.05,
            episode_length=10, ic_case="sinus", spectral_reward=False, noise=0.0)
        env = registry.make_env("burger", cfg=cfg, dtype=jnp.float64)
        traj, _ = rollout.zero_action_episode(env, jax.random.key(0))
        rewards = np.asarray(traj["rewards"][0, :, 0])
        np.testing.assert_allclose(rewards, 0.0, atol=1e-16)

    def test_coarse_grid_mse_negative_and_finite(self):
        cfg = burger_env.BurgerEnvConfig(
            N_dns=128, grid_size=32, num_actions=32, dt=0.01, T=0.5, nu=0.05,
            episode_length=10, ic_case="turbulence", spectral_reward=False, noise=0.0)
        env = registry.make_env("burger", cfg=cfg, dtype=jnp.float64)
        traj, _ = rollout.zero_action_episode(env, jax.random.key(0))
        rewards = np.asarray(traj["rewards"][0, :, 0])
        assert np.isfinite(rewards).all()
        assert (rewards <= 0).all() and rewards.min() < 0

    def test_truth_les_channel_matches_spline_path(self):
        # the pre-restricted truth channel (DnsPool.truth_les, the
        # setGroundTruth layout) must reproduce the spline-eval rewards: the
        # cubic spline is exact at its knots, and with noise=0 every query is
        # a knot, so the two paths agree to roundoff.
        cfg = burger_env.BurgerEnvConfig(
            N_dns=128, grid_size=32, num_actions=32, dt=0.01, T=0.5, nu=0.05,
            episode_length=10, ic_case="turbulence", spectral_reward=False,
            noise=0.0, scheme="fd")
        pool = burger_env.make_dns_pool(cfg, 1, dtype=jnp.float64)
        assert pool.truth_les is not None
        assert pool.truth_les.shape == pool.uu.shape[:2] + (32,)
        env_fast = registry.make_env("burger-fd", cfg=cfg, pool=pool)
        pool_slow = pool.replace(truth_les=None)
        env_slow = registry.make_env("burger-fd", cfg=cfg, pool=pool_slow)
        tf, _ = rollout.zero_action_episode(env_fast, jax.random.key(0))
        ts, _ = rollout.zero_action_episode(env_slow, jax.random.key(0))
        np.testing.assert_allclose(np.asarray(tf["rewards"]),
                                   np.asarray(ts["rewards"]), atol=1e-12)

    def test_marl_rewards_are_per_agent_block_means(self):
        na = 4
        cfg = burger_env.BurgerEnvConfig(
            N_dns=128, grid_size=32, num_actions=32, num_agents=na, dt=0.01,
            T=0.5, nu=0.05, episode_length=5, ic_case="turbulence",
            spectral_reward=False, noise=0.0)
        pool = burger_env.make_dns_pool(cfg, 1, dtype=jnp.float64)
        st, obs = burger_env.reset(cfg, pool, jax.random.key(0), 0)
        assert obs.shape == (na, cfg.obs_dim)
        actions = jnp.zeros((na, cfg.actions_per_agent), jnp.float64)
        st2, obs2, rew, done, _ = burger_env.step(cfg, pool, st, actions)
        assert rew.shape == (na,)
        # agent rewards differ (different blocks) but average to the global MSE
        st_single = burger_env.BurgerEnvConfig(
            **{**cfg.__dict__, "num_agents": 1, "num_actions": 32})
        env1 = registry.make_env("burger", cfg=st_single, pool=pool)
        s1, _ = burger_env.reset(st_single, pool, jax.random.key(0), 0)
        _, _, rew1, _, _ = burger_env.step(st_single, pool, s1,
                                           jnp.zeros((1, 32), jnp.float64))
        np.testing.assert_allclose(np.asarray(rew).mean(), np.asarray(rew1)[0], atol=1e-12)


class TestBurgerFeatures:
    def test_single_agent_version0(self, rng):
        u = rng.standard_normal(32)
        obs = features.burger_features(0, 1, jnp.asarray(u), jnp.asarray(u),
                                       jnp.asarray(np.fft.fft(u)), 0.01, 0.1)
        want = (np.roll(u, 1) - 2 * u + np.roll(u, -1)) / 0.1**2
        np.testing.assert_allclose(np.asarray(obs)[0], want, atol=1e-12)

    def test_marl_halo_slices_version1(self, rng):
        N, na, dt, dx = 16, 4, 0.01, 0.1
        u = rng.standard_normal(N)
        up = rng.standard_normal(N)
        obs = features.burger_features(1, na, jnp.asarray(u), jnp.asarray(up),
                                       jnp.asarray(np.fft.fft(u)), dt, dx)
        assert obs.shape == (na, 2 * (N // na + 2))
        dudt = (u - up) / dt
        d2 = (np.roll(u, 1) - 2 * u + np.roll(u, -1)) / dx**2
        # agent 2: indices 7..12 wrapped (Burger.py:658-660)
        idx = np.arange(2 * 4 - 1, 3 * 4 + 1) % N
        want = np.concatenate([dudt[idx], d2[idx]])
        np.testing.assert_allclose(np.asarray(obs)[2], want, atol=1e-12)

    def test_version3_appends_half_spectrum(self, rng):
        N = 16
        u = rng.standard_normal(N)
        v = np.fft.fft(u)
        obs = features.burger_features(3, 1, jnp.asarray(u), jnp.asarray(u),
                                       jnp.asarray(v), 0.01, 0.1)
        assert obs.shape == (1, N + N // 2)
        ek = 0.5 * np.abs(v) ** 2 / N * 0.1
        np.testing.assert_allclose(np.asarray(obs)[0, N:], ek[:N // 2], atol=1e-12)

    def test_obs_dim_matches_driver_table(self):
        # run-vracer-burger.py:136-146
        assert features.obs_dim(0, 32, 1) == 32
        assert features.obs_dim(1, 32, 1) == 64
        assert features.obs_dim(3, 32, 1) == 48
        assert features.obs_dim(0, 32, 4) == 10
        assert features.obs_dim(1, 32, 4) == 20


class TestDiffusionEnv:
    def test_exact_stencil_matches_fd_error_curve(self):
        # action -2 == plain FD: rewards must equal -(mse vs analytical) + bonus,
        # reproducing the diffusion_errors/plotErrors.py:40-48 recipe
        N, dt, nu, L = 16, 0.01, 0.1, 2 * np.pi
        cfg = diffusion_env.DiffusionEnvConfig(
            N=N, dt=dt, nu=nu, episode_length=300, noise=0.0)
        env = registry.make_env("diffusion-simple", cfg=cfg)
        st, obs = env.reset0(jax.random.key(0), 0)
        st = jax.tree.map(lambda a: a, st)
        rewards = []
        a = jnp.full((1, N), -2.0, jnp.float32)
        for _ in range(300):
            st, obs, rew, done, _ = env.step0(st, a)
            rewards.append(float(rew[0]))
        # oracle
        x = np.linspace(0, L, N, endpoint=False)
        u = np.sin(x)
        u0 = u.copy()
        want = []
        t = 0.0
        for n in range(300):
            u = u + dt * nu * (np.roll(u, 1) - 2 * u + np.roll(u, -1)) / (L / N)**2
            t += dt
            sol = u0 * np.exp(-(2 * np.pi / L)**2 * nu * t)
            want.append(-np.mean((sol - u) ** 2) + cfg.survival_bonus)
        np.testing.assert_allclose(rewards, want, atol=1e-7)

    def test_early_stop_on_negative_cumreward(self):
        cfg = diffusion_env.DiffusionEnvConfig(N=16, episode_length=100, noise=0.0)
        env = registry.make_env("diffusion-simple", cfg=cfg)
        st, obs = env.reset0(jax.random.key(0), 0)
        # large wrong actions blow up the MSE -> cumreward < 0 -> done
        a = jnp.full((1, 16), 5.0, jnp.float32)
        done_at = None
        for i in range(100):
            st, obs, rew, done, _ = env.step0(st, a)
            if bool(done) and done_at is None:
                done_at = i
        assert done_at is not None and done_at < 99

    def test_marl_obs_layout(self):
        cfg = diffusion_env.DiffusionEnvConfig(N=16, num_agents=4, noise=0.0)
        env = registry.make_env("diffusion-simple", cfg=cfg)
        st, obs = env.reset0(jax.random.key(0), 0)
        assert obs.shape == (4, 6)
        u = np.asarray(st.solver.u)
        np.testing.assert_allclose(np.asarray(obs)[1], u[np.arange(3, 9) % 16], atol=1e-7)


class TestAdvectionEnv:
    def test_exact_lax_action_reproduces_fd_error_curve(self):
        # the exact-Lax stencil action must match the uncontrolled FD rewards
        # (-mse vs analytical + bonus) — the advection_errors recipe
        N, nu = 16, 0.5
        dt = (2 * np.pi / nu) / 200    # advection_errors/plotErrors.py recipe
        cfg = registry.make_env("advection-simple", N=N, dt=dt, noise=0.0).cfg
        env = registry.make_env("advection-simple", cfg=cfg)
        st, obs = env.reset0(jax.random.key(0), 0)
        alpha = cfg.solver.alpha
        # pointwise interleaved (a0 -> u_{i+1}, a1 -> u_{i-1})
        pair = np.tile([0.5 - 0.5 * alpha, 0.5 + 0.5 * alpha], N)
        a = jnp.asarray(pair, jnp.float32)[None, :]
        got = []
        for _ in range(30):
            was_done = bool(st.done)
            st, obs, rew, done, _ = env.step0(st, a)
            if not was_done:
                got.append(float(rew[0]))
        # oracle: plain Lax + analytical sinus mse (Advection.py:138-152,238-249)
        L = 2 * np.pi
        x = np.linspace(0, L, N, endpoint=False)
        u = np.sin(x)
        t = 0.0
        want = []
        for n in range(30):
            u = (0.5 + 0.5 * alpha) * np.roll(u, 1) + (0.5 - 0.5 * alpha) * np.roll(u, -1)
            t += dt
            sol = np.sin(x - nu * t)
            want.append(-np.mean((sol - u) ** 2) + cfg.survival_bonus)
        # the env stops early once cumreward < 0 and zeroes later rewards;
        # compare the live prefix
        np.testing.assert_allclose(got, want[: len(got)], atol=1e-6)
        assert len(got) >= 10


class TestLaplaceEnv:
    def test_direct_reward_matches_residual(self, rng):
        env = registry.make_env("laplace", num_agents=8, sforce="sin")
        st, obs = env.reset0(jax.random.key(0), 0)
        assert obs.shape == (8, 4)
        a = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)
        st2, obs2, rew, done, _ = env.step0(st, a)
        u = np.asarray(st2.solver.u)
        f = np.asarray(st2.solver.force)
        dx = env.cfg.solver.grid.dx
        d2 = (np.roll(u, 1) - 2 * u + np.roll(u, -1)) / dx**2
        want = -(d2[1:] - f[1:]) ** 2
        np.testing.assert_allclose(np.asarray(rew), want, rtol=1e-4, atol=1e-5)


class TestRollout:
    def test_collect_episodes_shapes_and_mask(self):
        from marlpde_tpu.rl import vracer
        env = registry.make_env("diffusion-simple", N=16, episode_length=20, noise=0.0)
        rl_cfg = vracer.VracerConfig(
            obs_dim=env.obs_dim, act_dim=env.act_dim, num_agents=env.num_agents,
            episode_length=env.episode_length, width=16,
            action_low=env.action_low, action_high=env.action_high)
        ts = vracer.init_train(rl_cfg, jax.random.key(0))
        traj, final = rollout.collect_episodes(env, rl_cfg, ts, jax.random.key(1), 3)
        assert traj["obs"].shape == (3, 20, 1, env.obs_dim)
        assert traj["actions"].shape == (3, 20, 1, env.act_dim)
        assert traj["rewards"].shape == (3, 20, 1)
        assert traj["mask"].shape == (3, 20)
        m = np.asarray(traj["mask"])
        # masks are prefix-shaped: once 0, always 0
        assert ((np.diff(m, axis=1) <= 0) | (m[:, 1:] == 1)).all()


class TestLockstepDns:
    def test_lockstep_matches_pool_env_rewards(self):
        # with nunoise off, identical ICs and zero actions, the lockstep env's
        # spectral rewards must match the pool env's
        cfg = burger_env.BurgerEnvConfig(
            N_dns=64, grid_size=16, num_actions=16, dt=0.01, T=0.2, nu=0.05,
            episode_length=5, ic_case="turbulence", spectral_reward=True,
            noise=0.0, nunoise=False)
        env_pool = registry.make_env("burger", cfg=cfg, dtype=jnp.float64)
        env_lock = registry.make_env("burger-lockstep", cfg=cfg, nunoise=False)
        tp, _ = rollout.zero_action_episode(env_pool, jax.random.key(0))
        tl, _ = rollout.zero_action_episode(env_lock, jax.random.key(0))
        np.testing.assert_allclose(np.asarray(tl["rewards"][0, :, 0]),
                                   np.asarray(tp["rewards"][0, :, 0]),
                                   atol=2e-5)

    def test_nunoise_draws_different_viscosities(self):
        env = registry.make_env(
            "burger-lockstep", N_dns=64, grid_size=16, num_actions=16,
            dt=0.01, T=0.2, nu=0.05, episode_length=5, ic_case="turbulence",
            spectral_reward=True, noise=0.0)
        s1, _ = env.reset0(jax.random.key(1), 0)
        s2, _ = env.reset0(jax.random.key(2), 1)
        nu1, nu2 = float(s1.dns.nu), float(s2.dns.nu)
        assert nu1 != nu2
        assert 0.01 <= nu1 <= 0.03 and 0.01 <= nu2 <= 0.03  # Burger.py:89

    def test_lockstep_mse_reward_mode(self):
        env = registry.make_env(
            "burger-lockstep", N_dns=64, grid_size=16, num_actions=16,
            dt=0.01, T=0.2, nu=0.05, episode_length=5, ic_case="turbulence",
            spectral_reward=False, noise=0.0, nunoise=False)
        traj, final = rollout.zero_action_episode(env, jax.random.key(0))
        r = np.asarray(traj["rewards"][0, :, 0])
        assert np.isfinite(r).all() and (r <= 0).all()


class TestKsEnv:
    def test_zero_action_episode_and_obs(self):
        from marlpde_tpu.envs import ks_env
        cfg = ks_env.KSEnvConfig(
            N_dns=128, grid_size=32, num_actions=32, t_transient=5.0,
            t_end=10.0, episode_length=5, noise=0.0)
        env = registry.make_env("ks", cfg=cfg, dtype=jnp.float64)
        traj, final = rollout.zero_action_episode(env, jax.random.key(0))
        r = np.asarray(traj["rewards"][0, :, 0])
        assert np.isfinite(r).all()
        assert traj["obs"].shape == (1, 5, 1, 64)
        # first reward = -err_1 <= 0 (spectral decrement from prev=0)
        assert r[0] <= 0

    def test_ks_marl_obs_shape(self):
        from marlpde_tpu.envs import ks_env
        cfg = ks_env.KSEnvConfig(
            N_dns=128, grid_size=32, num_actions=32, num_agents=4,
            t_transient=5.0, t_end=10.0, episode_length=5, noise=0.0)
        env = registry.make_env("ks", cfg=cfg, dtype=jnp.float64)
        st, obs = env.reset0(jax.random.key(0), 0)
        assert obs.shape == (4, cfg.obs_dim)
        assert cfg.obs_dim == 2 * (32 // 4 + 2)
