"""Pallas kernel validation (interpret mode on CPU; compiled path exercised by
bench.py on real TPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))


class TestAbcnKernel:
    def _inputs(self, B, N, seed=0):
        rng = np.random.default_rng(seed)
        u = (rng.standard_normal((B, N)) * 0.1).astype(np.float32)
        v = np.fft.fft(u, axis=-1)
        return dict(
            u=jnp.asarray(u),
            v_re=jnp.asarray(v.real.astype(np.float32)),
            v_im=jnp.asarray(v.imag.astype(np.float32)),
            fn_re=jnp.zeros((B, N), jnp.float32),
            fn_im=jnp.zeros((B, N), jnp.float32),
            nu=jnp.full((B, 1), 0.02, jnp.float32),
            af_re=jnp.asarray((rng.standard_normal((B, N)) * 0.01).astype(np.float32)),
            af_im=jnp.asarray((rng.standard_normal((B, N)) * 0.01).astype(np.float32)))

    def test_matches_jnp_reference(self):
        from marlpde_tpu.ops import abcn_pallas
        B, N = 8, 32
        args = self._inputs(B, N)
        kw = dict(n_intermediate=5, dt=1e-3, dx=float(2 * np.pi / N))
        out_k = abcn_pallas.abcn_macro_step(**args, **kw, tile_b=8)
        out_r = abcn_pallas.abcn_macro_step_reference(**args, **kw)
        names = ["u", "v_re", "v_im", "fn_re", "fn_im", "ek"]
        for i, name in enumerate(names):
            np.testing.assert_allclose(np.asarray(out_k[i]), np.asarray(out_r[i]),
                                       atol=2e-6, err_msg=name)

    def test_matches_complex_abcn_solver(self):
        # the real-arithmetic kernel math reproduces the complex ABCN stepper
        from marlpde_tpu.ops import abcn_pallas
        from marlpde_tpu.solvers import burger
        B, N = 4, 32
        L = 2 * np.pi
        args = self._inputs(B, N, seed=3)
        args["af_re"] = jnp.zeros((B, N), jnp.float32)
        args["af_im"] = jnp.zeros((B, N), jnp.float32)
        # the solver seeds fn_old = k1*fft(0.5*u^2) at init (Burger.py:320)
        u_np = np.asarray(args["u"])
        k = np.fft.fftfreq(N, 1.0 / N)
        D = np.fft.fft(0.5 * u_np * u_np, axis=-1)
        args["fn_re"] = jnp.asarray((-k * D.imag).astype(np.float32))
        args["fn_im"] = jnp.asarray((k * D.real).astype(np.float32))
        kw = dict(n_intermediate=4, dt=1e-3, dx=float(L / N))
        out = abcn_pallas.abcn_macro_step(**args, **kw, tile_b=4)
        cfg = burger.BurgerConfig(N=N, L=L, dt=1e-3, nu=0.02)
        st = burger.init(cfg, u0=args["u"])
        for _ in range(4):
            st, _ = burger.step(cfg, st)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(st.u), atol=2e-5)

    def test_multiple_tiles(self):
        from marlpde_tpu.ops import abcn_pallas
        B, N = 16, 32
        args = self._inputs(B, N, seed=7)
        kw = dict(n_intermediate=3, dt=1e-3, dx=float(2 * np.pi / N))
        out_tiled = abcn_pallas.abcn_macro_step(**args, **kw, tile_b=4)
        out_whole = abcn_pallas.abcn_macro_step(**args, **kw, tile_b=16)
        np.testing.assert_allclose(np.asarray(out_tiled[0]),
                                   np.asarray(out_whole[0]), atol=1e-6)


class TestFastEnvParity:
    def _setup(self):
        from marlpde_tpu.envs import burger_env, registry
        cfg = burger_env.BurgerEnvConfig(
            N_dns=64, grid_size=32, num_actions=32, num_agents=4,
            dt=0.01, T=0.5, nu=0.05, episode_length=5, ic_case="turbulence",
            spectral_reward=True, noise=0.0, version=0)
        pool = burger_env.make_dns_pool(cfg, 1, dtype=jnp.float32)
        return cfg, pool

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_fast_step_matches_general_env(self, use_pallas):
        from marlpde_tpu.envs import burger_env, burger_fast
        cfg, pool = self._setup()
        B = 4
        keys = jax.random.split(jax.random.key(0), B)
        counts = jnp.arange(B)

        fstate, fobs = burger_fast.reset(cfg, pool, keys, counts)
        gstate, gobs = jax.vmap(lambda k, c: burger_env.reset(cfg, pool, k, c))(keys, counts)
        np.testing.assert_allclose(np.asarray(fobs), np.asarray(gobs), atol=1e-6)

        rngA = np.random.default_rng(1)
        for i in range(3):
            a = jnp.asarray(rngA.standard_normal(
                (B, cfg.num_agents, cfg.actions_per_agent)).astype(np.float32))
            fstate, fobs, frew, fdone, _ = burger_fast.step(
                cfg, pool, fstate, a, use_pallas=use_pallas, tile_b=4)
            gstate, gobs, grew, gdone, _ = jax.vmap(
                lambda s, aa: burger_env.step(cfg, pool, s, aa))(gstate, a)
            np.testing.assert_allclose(np.asarray(frew), np.asarray(grew),
                                       atol=2e-4, err_msg=f"step {i}")
            np.testing.assert_allclose(np.asarray(fstate.u), np.asarray(gstate.solver.u),
                                       atol=2e-4, err_msg=f"step {i}")


class TestMlpKernel:
    def test_matches_flax_forward(self, rng):
        from marlpde_tpu.ops import mlp_pallas
        from marlpde_tpu.rl import networks
        net = networks.VracerNet(act_dim=2, width=32, n_hidden=2, init_noise=0.3)
        obs = jnp.asarray(rng.standard_normal((100, 5)).astype(np.float32))
        params = net.init(jax.random.key(0), obs[:1])
        v_ref, mu_ref, sig_ref = net.apply(params, obs)
        v, mu, sig = mlp_pallas.mlp_forward(obs, params, init_noise=0.3,
                                            tile_r=64)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(sig), np.asarray(sig_ref), atol=2e-5)

    def test_row_padding(self, rng):
        from marlpde_tpu.ops import mlp_pallas
        from marlpde_tpu.rl import networks
        net = networks.VracerNet(act_dim=1, width=16, n_hidden=2, init_noise=0.1)
        obs = jnp.asarray(rng.standard_normal((37, 3)).astype(np.float32))
        params = net.init(jax.random.key(1), obs[:1])
        v_ref, mu_ref, sig_ref = net.apply(params, obs)
        v, mu, sig = mlp_pallas.mlp_forward(obs, params, init_noise=0.1,
                                            tile_r=32)
        assert v.shape == (37,)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), atol=2e-5)
