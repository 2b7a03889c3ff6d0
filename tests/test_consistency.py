"""Reference test-category ports (SURVEY.md §4.2-4.3): restart determinism,
DNS<->LES consistency, grid-refinement sequences, energy budgets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlpde_tpu.core import ic, interp, spectral
from marlpde_tpu.solvers import burger, ks


class TestRestart:
    def test_ks_restart_from_u0_and_v0(self):
        # tests/ks/restart.py: re-simulating from saved u0/v0 reproduces
        N, L, dt = 64, 22.0, 0.25
        cfg = ks.KSConfig(N=N, L=L, dt=dt)
        u0 = ic.ks_noise(jax.random.key(1), N, jnp.float64)
        st = ks.init(cfg, u0=u0)
        _, uu1, vv1 = ks.simulate(cfg, st, 100)
        _, uu2, _ = ks.simulate(cfg, ks.init(cfg, u0=u0), 100)
        _, uu3, _ = ks.simulate(cfg, ks.init(cfg, v0=vv1[0]), 100)
        np.testing.assert_array_equal(np.asarray(uu1), np.asarray(uu2))
        np.testing.assert_allclose(np.asarray(uu1), np.asarray(uu3), atol=1e-12)

    def test_burger_restart_mid_trajectory(self):
        # restart from a mid-trajectory state continues identically
        N, L = 64, 2 * np.pi
        cfg = burger.BurgerConfig(N=N, L=L, dt=1e-3, nu=0.05)
        x = np.linspace(0, L, N, endpoint=False)
        st = burger.init(cfg, u0=jnp.asarray(np.sin(4 * np.pi * x / L)))
        mid, uu_full, _ = burger.simulate(cfg, st, 50)
        st2 = burger.init(cfg, u0=uu_full[25])
        _, uu_tail, _ = burger.simulate(cfg, st2, 25)
        # note: ABCN carries Fn_old; a cold restart re-seeds it from the IC
        # formula (Burger.py:320), exactly like the reference's IC(u0=...)
        # restart — agreement is to the scheme's restart consistency, not
        # bitwise (first step uses AB1 effectively)
        np.testing.assert_allclose(np.asarray(uu_tail[-1]),
                                   np.asarray(uu_full[-1]), atol=1e-3)


class TestDnsLesConsistency:
    def test_coarse_run_matches_restricted_fine_run_linear_regime(self):
        # tests/burger/interpolate.py idea: for a viscous (smooth) solution
        # whose energy stays in resolved modes, the N=64 run restricted to 16
        # modes matches the N=16 run
        L, dt, nu, nsteps = 2 * np.pi, 1e-3, 0.5, 200
        x64 = np.linspace(0, L, 64, endpoint=False)
        u0_fine = jnp.asarray(0.1 * np.sin(2 * np.pi * x64 / L))
        cfg_f = burger.BurgerConfig(N=64, L=L, dt=dt, nu=nu)
        _, uu_f, vv_f = burger.simulate(cfg_f, burger.init(cfg_f, u0=u0_fine), nsteps)

        v0_coarse = spectral.restrict_modes(vv_f[0], 16)
        cfg_c = burger.BurgerConfig(N=16, L=L, dt=dt, nu=nu)
        _, uu_c, _ = burger.simulate(cfg_c, burger.init(cfg_c, v0=v0_coarse), nsteps)

        u_f_restricted = spectral.irfft_real(spectral.restrict_modes(vv_f[-1], 16))
        np.testing.assert_allclose(np.asarray(uu_c[-1]),
                                   np.asarray(u_f_restricted), atol=1e-6)

    def test_grid_refinement_converges(self):
        # tests/burger/simulatediffsequence.py: N-refinement errors shrink
        L, dt, nu, T = 2 * np.pi, 1e-4, 0.1, 0.3
        nsteps = int(T / dt)
        sols = {}
        for N in (32, 64, 128):
            x = np.linspace(0, L, N, endpoint=False)
            cfg = burger.BurgerConfig(N=N, L=L, dt=dt, nu=nu)
            st = burger.init(cfg, u0=jnp.asarray(np.sin(4 * np.pi * x / L)))
            _, uu, _ = burger.simulate(cfg, st, nsteps)
            sols[N] = np.asarray(uu[-1])
        e32 = np.abs(sols[32] - sols[128][::4]).max()
        e64 = np.abs(sols[64] - sols[128][::2]).max()
        assert e64 < e32

    def test_energy_budget_fine_vs_coarse(self):
        # tests/ks/interpolate_energies.py idea: resolved-mode energy of the
        # coarse run tracks the fine run while the solution is smooth
        L, dt, nu, nsteps = 2 * np.pi, 1e-3, 0.3, 100
        x = np.linspace(0, L, 64, endpoint=False)
        u0 = jnp.asarray(0.2 * np.sin(2 * np.pi * x / L))
        cfg_f = burger.BurgerConfig(N=64, L=L, dt=dt, nu=nu)
        _, _, vv_f = burger.simulate(cfg_f, burger.init(cfg_f, u0=u0), nsteps)
        cfg_c = burger.BurgerConfig(N=16, L=L, dt=dt, nu=nu)
        v0c = spectral.restrict_modes(vv_f[0], 16)
        _, _, vv_c = burger.simulate(cfg_c, burger.init(cfg_c, v0=v0c), nsteps)
        ef = spectral.energy_spectrum(vv_f[-1], L / 64)[:8].sum()
        ec = spectral.energy_spectrum(vv_c[-1], L / 16)[:8].sum()
        np.testing.assert_allclose(float(ec), float(ef), rtol=1e-4)


class TestTurbulenceSpectrum:
    def test_ic_spectrum_follows_k53(self):
        # tests/burger/turbulence.py: the IC's energy spectrum ~ k^-5/3
        N, L = 1024, 2 * np.pi
        x = jnp.asarray(np.linspace(0, L, N, endpoint=False))
        u0 = ic.burger_turbulence(42, 0.0, x, L)
        v = np.fft.fft(np.asarray(u0))
        ek = 0.5 * np.abs(v) ** 2 / N * (L / N)
        kk = np.arange(1, N // 4)
        slope = np.polyfit(np.log(kk[5:]), np.log(ek[6:N // 4]), 1)[0]
        assert -2.0 < slope < -1.3   # ~ -5/3
