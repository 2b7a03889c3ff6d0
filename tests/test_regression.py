"""Pinned regression baselines (tests/data/*.json) — this framework's analogue
of the reference's checked-in diffusion/advection error JSONs (SURVEY.md §4.1):
solver behavior is locked against silent drift across rounds.

Chaotic trajectories (Burgers turbulence, KS) are pinned via integral
quantities (L2 norms / energies) at float64 on CPU — exactly reproducible.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from marlpde_tpu.analysis import diagnostics
from marlpde_tpu.core import ic
from marlpde_tpu.solvers import advection, burger, diffusion, ks

DATA = os.path.join(os.path.dirname(__file__), "data")


def load(name):
    with open(os.path.join(DATA, name)) as f:
        return json.load(f)


class TestDiffusionRegression:
    @pytest.mark.parametrize("N", [8, 16, 32, 128])
    def test_error_curves_pinned(self, N):
        ref = load(f"diffusion_fd_error_{N}.json")
        cfg = diffusion.DiffusionConfig(N=N, dt=0.01, nu=0.1)
        x = np.linspace(0, cfg.L, N, endpoint=False)
        st = diffusion.init(cfg, jnp.asarray(np.sin(x)))
        final, uu = diffusion.simulate(cfg, st, 300)
        tt = np.arange(301) * 0.01
        sol = np.asarray(st.u0)[None, :] * np.exp(
            -(2 * np.pi / cfg.L) ** 2 * cfg.nu * tt)[:, None]
        got = diagnostics.error_curves(uu, sol, tt)
        np.testing.assert_allclose(got["mse"], ref["mse"], rtol=1e-10, atol=1e-14)
        np.testing.assert_allclose(got["mass"], ref["mass"], rtol=1e-10, atol=1e-10)


class TestAdvectionRegression:
    @pytest.mark.parametrize("N", [8, 16, 128])
    def test_error_curves_pinned(self, N):
        ref = load(f"advection_lax_error_{N}.json")
        nu = 0.5
        T = 2 * np.pi / nu
        dt = T / 200
        cfg = advection.AdvectionConfig(N=N, dt=dt, nu=nu)
        x = np.linspace(0, cfg.L, N, endpoint=False)
        st = advection.init(cfg, jnp.asarray(np.sin(x)))
        final, uu = advection.simulate(cfg, st, 200)
        tt = np.arange(201) * dt
        sol = np.stack([np.sin(x - nu * t) for t in tt])
        got = diagnostics.error_curves(uu, sol, tt)
        np.testing.assert_allclose(got["mse"], ref["mse"], rtol=1e-10, atol=1e-14)


class TestBurgerRegression:
    def test_turbulence_trajectory_norms_pinned(self):
        ref = load("burger_turb_traj.json")
        cfg = burger.BurgerConfig(N=ref["N"], dt=ref["dt"], nu=ref["nu"])
        x = jnp.asarray(np.linspace(0, cfg.L, ref["N"], endpoint=False))
        u0 = ic.burger_turbulence(ref["seed"], 0.0, x, cfg.L)
        _, uu, _ = burger.simulate(cfg, burger.init(cfg, u0=u0), 1000)
        norms = [float(np.linalg.norm(np.asarray(uu[i])))
                 for i in range(0, 1001, 100)]
        np.testing.assert_allclose(norms, ref["l2_norms_every_100"], rtol=1e-9)


class TestKsRegression:
    def test_energy_trace_pinned(self):
        ref = load("ks_energy_trace.json")
        cfg = ks.KSConfig(N=ref["N"], L=ref["L"], dt=ref["dt"])
        rng = np.random.default_rng(0)
        st = ks.init(cfg, u0=jnp.asarray(1e-3 * rng.standard_normal(ref["N"])))
        _, uu, _ = ks.simulate(cfg, st, 800)
        E = [float((np.asarray(uu[i]) ** 2).sum()) for i in range(0, 801, 100)]
        # chaotic after transient: compare early (deterministic growth) exactly,
        # late (attractor) loosely
        np.testing.assert_allclose(E[:4], ref["energy_every_100"][:4], rtol=1e-6)
        assert all(0.1 < e < 1e3 for e in E[4:])
