"""Solver parity tests.

Oracles are literal numpy re-derivations of the reference update formulas
(cited file:line), executed in float64 — not imports of reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlpde_tpu.core import ic, spectral
from marlpde_tpu.solvers import advection, analytical, burger, diffusion, ks, laplace


# ---------------------------------------------------------------- numpy oracles

def np_abcn_simulate(u0, N, L, dt, nu, nsteps, forcing_fn=None):
    """Literal ABCN loop per Burger.py:482-489 (+ optional per-step forcing field)."""
    k = np.fft.fftfreq(N, L / (2 * np.pi * N))
    k1 = 1j * k
    k2 = k1**2
    v = np.fft.fft(u0)
    u = u0.copy()
    fn_old = k1 * np.fft.fft(0.5 * u**2)
    uu = [u0.copy()]
    for n in range(nsteps):
        F = np.zeros(N, dtype=complex)
        if forcing_fn is not None:
            F = np.fft.fft(forcing_fn(n, u))
        C = -0.5 * k2 * nu * dt
        Fn = k1 * np.fft.fft(0.5 * u**2)
        v = ((1.0 - C) * v - 0.5 * dt * (3.0 * Fn - fn_old) + dt * F) / (1.0 + C)
        fn_old = Fn.copy()
        u = np.real(np.fft.ifft(v))
        uu.append(u.copy())
    return np.array(uu)


def np_fd_burger_simulate(u0, N, L, dt, nu, nsteps):
    """Literal explicit-FD loop per Burger_fd.py:460-468."""
    dx = L / N
    u = u0.copy()
    uu = [u0.copy()]
    for n in range(nsteps):
        um, up = np.roll(u, 1), np.roll(u, -1)
        dudx = (u - um) / dx
        d2udx2 = (up - 2 * u + um) / dx**2
        u = u + dt * (nu * d2udx2 - u * dudx)
        uu.append(u.copy())
    return np.array(uu)


def np_ks_simulate(u0, N, L, dt, nsteps):
    """Literal ETDRK4 loop per KS.py:127-137,255-267."""
    k = np.fft.fftfreq(N, L / (2 * np.pi * N))
    l = k**2 - k**4
    E = np.exp(dt * l)
    E2 = np.exp(dt * l / 2.0)
    MM = 62
    r = np.exp(1j * np.pi * (np.r_[1:MM + 1] - 0.5) / MM)
    LR = dt * np.repeat(l[:, None], MM, axis=1) + np.repeat(r[None, :], N, axis=0)
    Q = dt * np.real(np.mean((np.exp(LR / 2.0) - 1.0) / LR, 1))
    f1 = dt * np.real(np.mean((-4.0 - LR + np.exp(LR) * (4.0 - 3.0 * LR + LR**2)) / LR**3, 1))
    f2 = dt * np.real(np.mean((2.0 + LR + np.exp(LR) * (-2.0 + LR)) / LR**3, 1))
    f3 = dt * np.real(np.mean((-4.0 - 3.0 * LR - LR**2 + np.exp(LR) * (4.0 - LR)) / LR**3, 1))
    g = -0.5j * k
    v = np.fft.fft(u0)
    vv = [v.copy()]
    for n in range(nsteps):
        Nv = g * np.fft.fft(np.real(np.fft.ifft(v))**2)
        a = E2 * v + Q * Nv
        Na = g * np.fft.fft(np.real(np.fft.ifft(a))**2)
        b = E2 * v + Q * Na
        Nb = g * np.fft.fft(np.real(np.fft.ifft(b))**2)
        c = E2 * a + Q * (2.0 * Nb - Nv)
        Nc = g * np.fft.fft(np.real(np.fft.ifft(c))**2)
        v = E * v + Nv * f1 + 2.0 * (Na + Nb) * f2 + Nc * f3
        vv.append(v.copy())
    return np.array(vv)


# -------------------------------------------------------------------- Burgers

class TestBurgerABCN:
    def test_matches_numpy_oracle(self):
        N, L, dt, nu, nsteps = 64, 2 * np.pi, 1e-3, 0.02, 200
        x = np.linspace(0, L, N, endpoint=False)
        u0 = np.sin(4 * np.pi * x / L)
        cfg = burger.BurgerConfig(N=N, L=L, dt=dt, nu=nu)
        st = burger.init(cfg, u0=jnp.asarray(u0))
        _, uu, _ = jax.jit(lambda s: burger.simulate(cfg, s, nsteps))(st)
        want = np_abcn_simulate(u0, N, L, dt, nu, nsteps)
        np.testing.assert_allclose(np.asarray(uu), want, atol=1e-11)

    def test_turbulence_ic_trajectory(self):
        # fixed-seed turbulence IC + ABCN: deterministic, finite, bounded energy
        N, L, dt, nu = 512, 2 * np.pi, 1e-3, 0.02
        x = jnp.asarray(np.linspace(0, L, N, endpoint=False))
        u0 = ic.burger_turbulence(42, 0.0, x, L)
        cfg = burger.BurgerConfig(N=N, L=L, dt=dt, nu=nu)
        st = burger.init(cfg, u0=u0)
        _, uu, _ = jax.jit(lambda s: burger.simulate(cfg, s, 500))(st)
        want = np_abcn_simulate(np.asarray(u0), N, L, dt, nu, 500)
        np.testing.assert_allclose(np.asarray(uu), want, atol=1e-9)

    def test_restart_reproduces_trajectory(self):
        # reference restart test (tests/burger/restart.py): re-init from u0 and
        # from v0 must reproduce the same trajectory
        N, L = 64, 2 * np.pi
        cfg = burger.BurgerConfig(N=N, L=L, dt=1e-3, nu=0.02)
        x = np.linspace(0, L, N, endpoint=False)
        u0 = np.sin(4 * np.pi * x / L)
        st = burger.init(cfg, u0=jnp.asarray(u0))
        _, uu1, vv1 = burger.simulate(cfg, st, 100)
        st2 = burger.init(cfg, u0=jnp.asarray(u0))
        _, uu2, _ = burger.simulate(cfg, st2, 100)
        st3 = burger.init(cfg, v0=vv1[0])
        _, uu3, _ = burger.simulate(cfg, st3, 100)
        np.testing.assert_allclose(np.asarray(uu1), np.asarray(uu2), atol=0)
        np.testing.assert_allclose(np.asarray(uu1), np.asarray(uu3), atol=1e-12)

    def test_stochastic_forcing_matches_reference_formula(self):
        # Burger.py:410-421 with injected tables; stepper=4 exercises ridx cycling
        N, L, dt, s = 32, 2 * np.pi, 1e-3, 4
        rng = np.random.default_rng(0)
        rf1 = rng.standard_normal((4, s))
        rf2 = rng.standard_normal((4, s))
        x = np.linspace(0, L, N, endpoint=False)
        u0 = np.sin(4 * np.pi * x / L)
        cfg = burger.BurgerConfig(N=N, L=L, dt=dt, nu=0.02, stepper=s, forcing=True)
        st = burger.init(cfg, u0=jnp.asarray(u0), randfac1=rf1, randfac2=rf2, offset=0.1)
        _, uu, _ = burger.simulate(cfg, st, 12)

        def forcing_fn(n, u):
            f = np.zeros(N)
            A = np.sqrt(2.0) / L
            ridx = n % s
            for kk in range(1, 4):
                f += rf1[kk, ridx] * A / np.sqrt(kk * s * dt) * np.cos(
                    2 * np.pi * kk * (x + 0.1) / L + 2 * np.pi * rf2[kk, ridx])
            return f

        want = np_abcn_simulate(u0, N, L, dt, 0.02, 12, forcing_fn)
        np.testing.assert_allclose(np.asarray(uu), want, atol=1e-12)

    def test_action_forcing_dforce(self):
        # action field enters the RHS directly when dforce=True (Burger.py:466)
        N, L, dt = 32, 2 * np.pi, 1e-3
        x = np.linspace(0, L, N, endpoint=False)
        u0 = np.sin(4 * np.pi * x / L)
        af = 0.1 * np.cos(2 * np.pi * x / L)
        cfg = burger.BurgerConfig(N=N, L=L, dt=dt, nu=0.02)
        st = burger.init(cfg, u0=jnp.asarray(u0))
        fields = jnp.broadcast_to(jnp.asarray(af), (5, N))
        _, uu, _ = burger.simulate(cfg, st, 5, action_fields=fields)
        want = np_abcn_simulate(u0, N, L, dt, 0.02, 5, lambda n, u: af)
        np.testing.assert_allclose(np.asarray(uu), want, atol=1e-12)

    def test_ssm_closure_changes_solution_smoothly(self):
        N, L = 64, 2 * np.pi
        x = jnp.asarray(np.linspace(0, L, N, endpoint=False))
        u0 = ic.burger_turbulence(1, 0.0, x, L)
        base = burger.BurgerConfig(N=N, L=L, dt=1e-3, nu=0.02)
        ssm = burger.BurgerConfig(N=N, L=L, dt=1e-3, nu=0.02, ssm=True)
        _, uu0, _ = burger.simulate(base, burger.init(base, u0=u0), 100)
        _, uu1, _ = burger.simulate(ssm, burger.init(ssm, u0=u0), 100)
        d = np.abs(np.asarray(uu1) - np.asarray(uu0)).max()
        assert 0 < d < 0.5 and np.isfinite(np.asarray(uu1)).all()

    def test_dsm_closure_finite(self):
        N, L = 64, 2 * np.pi
        x = jnp.asarray(np.linspace(0, L, N, endpoint=False))
        u0 = ic.burger_turbulence(2, 0.0, x, L)
        dsm = burger.BurgerConfig(N=N, L=L, dt=1e-3, nu=0.02, dsm=True)
        _, uu, _ = burger.simulate(dsm, burger.init(dsm, u0=u0), 100)
        assert np.isfinite(np.asarray(uu)).all()

    def test_batched_vmap_matches_single(self):
        N, L = 32, 2 * np.pi
        cfg = burger.BurgerConfig(N=N, L=L, dt=1e-3, nu=0.02)
        x = np.linspace(0, L, N, endpoint=False)
        u0s = np.stack([np.sin(4 * np.pi * x / L), np.cos(2 * np.pi * x / L) * 0.5])
        st = burger.init(cfg, u0=jnp.asarray(u0s))
        stepf = jax.vmap(lambda s: burger.step(cfg, s)[0])
        out = stepf(st)
        for i in range(2):
            sti = burger.init(cfg, u0=jnp.asarray(u0s[i]))
            outi, _ = burger.step(cfg, sti)
            np.testing.assert_allclose(np.asarray(out.u[i]), np.asarray(outi.u), atol=1e-13)


class TestBurgerFD:
    def test_matches_numpy_oracle(self):
        N, L, dt, nu = 128, 2 * np.pi, 1e-4, 0.02
        x = np.linspace(0, L, N, endpoint=False)
        u0 = np.sin(4 * np.pi * x / L)
        cfg = burger.BurgerConfig(N=N, L=L, dt=dt, nu=nu, scheme="fd")
        st = burger.init(cfg, u0=jnp.asarray(u0))
        _, uu, _ = burger.simulate(cfg, st, 100)
        want = np_fd_burger_simulate(u0, N, L, dt, nu, 100)
        np.testing.assert_allclose(np.asarray(uu), want, atol=1e-12)


class TestBurgerRK3:
    def test_rk3_vs_abcn_convergence(self):
        # other/convergencerate.py: both schemes converge to the same solution
        N, L, nu, T = 64, 2 * np.pi, 0.05, 0.5
        x = np.linspace(0, L, N, endpoint=False)
        u0 = jnp.asarray(np.sin(4 * np.pi * x / L))
        errs = []
        for dt in (1e-2, 1e-3):
            nsteps = int(T / dt)
            c1 = burger.BurgerConfig(N=N, L=L, dt=dt, nu=nu, scheme="rk3")
            c2 = burger.BurgerConfig(N=N, L=L, dt=dt, nu=nu, scheme="abcn")
            _, uu1, _ = burger.simulate(c1, burger.init(c1, u0=u0), nsteps)
            _, uu2, _ = burger.simulate(c2, burger.init(c2, u0=u0), nsteps)
            errs.append(np.abs(np.asarray(uu1[-1]) - np.asarray(uu2[-1])).max())
        assert errs[1] < errs[0] * 0.1   # schemes agree as dt -> 0

    def test_cfd_rk3_runs_and_converges_spatially(self):
        # compact-FD scheme approaches the spectral solution as N grows
        L, nu, dt, T = 2 * np.pi, 0.05, 1e-4, 0.2
        nsteps = int(T / dt)
        errs = []
        for N in (64, 128):
            x = np.linspace(0, L, N, endpoint=False)
            u0 = jnp.asarray(np.sin(4 * np.pi * x / L))
            cc = burger.BurgerConfig(N=N, L=L, dt=dt, nu=nu, scheme="cfd_rk3")
            cs = burger.BurgerConfig(N=N, L=L, dt=dt, nu=nu, scheme="rk3")
            _, uc, _ = burger.simulate(cc, burger.init(cc, u0=u0), nsteps)
            _, us, _ = burger.simulate(cs, burger.init(cs, u0=u0), nsteps)
            errs.append(np.abs(np.asarray(uc[-1]) - np.asarray(us[-1])).max())
        # the reference's weighted stencil blend is formally 2nd order
        # (the 14/9 + 1/9 combination does not cancel the h^2 term)
        assert errs[1] < errs[0] * 0.35


class TestBurgerAnalytical:
    def test_exact_solution_against_fine_spectral_run(self):
        # Hermite-quadrature oracle vs a fine ABCN run of the same problem,
        # mapped to the periodic domain: u(x,0) = -sin(pi*(x-1)) on [0,2]
        nu = 0.05
        N, L, dt, T = 256, 2.0, 1e-4, 0.5
        x = np.linspace(0, L, N, endpoint=False)
        u0 = -np.sin(np.pi * (x - 1.0))
        cfg = burger.BurgerConfig(N=N, L=L, dt=dt, nu=nu)
        st = burger.init(cfg, u0=jnp.asarray(u0))
        _, uu, _ = burger.simulate(cfg, st, int(T / dt))
        got = np.asarray(uu[-1])
        # qn=64: the reference's default qn=8 rule carries ~1% quadrature error
        want = analytical.burgers_viscous_exact(nu, x - 1.0, np.array([0.0, T]), qn=64)[:, 1]
        np.testing.assert_allclose(got, want, atol=2e-4)
        # and the qn=8 default agrees with itself at the ~1% level
        want8 = analytical.burgers_viscous_exact(nu, x - 1.0, np.array([0.0, T]), qn=8)[:, 1]
        assert np.abs(want8 - want).max() < 0.02


# ------------------------------------------------------------------------- KS

class TestKS:
    def test_matches_numpy_oracle(self):
        N, L, dt = 128, 22.0, 0.25
        rng = np.random.default_rng(3)
        u0 = 1e-3 * rng.standard_normal(N)
        cfg = ks.KSConfig(N=N, L=L, dt=dt)
        st = ks.init(cfg, u0=jnp.asarray(u0))
        _, uu, vv = ks.simulate(cfg, st, 50)
        want = np_ks_simulate(u0, N, L, dt, 50)
        np.testing.assert_allclose(np.asarray(vv), want, atol=1e-10)

    def test_chaotic_attractor_bounded(self):
        # KS on L=22 reaches a bounded chaotic attractor (|u| ~ O(3))
        N, L, dt = 64, 22.0, 0.25
        u0 = ic.ks_noise(jax.random.key(0), N, dtype=jnp.float64)
        cfg = ks.KSConfig(N=N, L=L, dt=dt)
        st = ks.init(cfg, u0=u0)
        final, uu, _ = jax.jit(lambda s: ks.simulate(cfg, s, 2000))(st)
        tail = np.asarray(uu[-500:])
        assert np.isfinite(tail).all()
        assert 0.5 < np.abs(tail).max() < 10.0

    def test_action_forcing_enters_all_stages(self):
        # with dforce and a constant forcing field, compare against oracle with
        # modified final update (KS.py:264-265)
        N, L, dt = 64, 22.0, 0.25
        rng = np.random.default_rng(5)
        u0 = 1e-2 * rng.standard_normal(N)
        af = 1e-3 * np.cos(2 * np.pi * np.arange(N) / N)
        cfg = ks.KSConfig(N=N, L=L, dt=dt)
        st = ks.init(cfg, u0=jnp.asarray(u0))
        fields = jnp.broadcast_to(jnp.asarray(af), (10, N))
        _, _, vv = ks.simulate(cfg, st, 10, action_fields=fields)

        # oracle with forcing
        k = np.fft.fftfreq(N, L / (2 * np.pi * N))
        l = k**2 - k**4
        E, E2 = np.exp(dt * l), np.exp(dt * l / 2)
        MM = 62
        r = np.exp(1j * np.pi * (np.r_[1:MM + 1] - 0.5) / MM)
        LR = dt * np.repeat(l[:, None], MM, 1) + np.repeat(r[None, :], N, 0)
        Q = dt * np.real(np.mean((np.exp(LR / 2) - 1) / LR, 1))
        f1 = dt * np.real(np.mean((-4 - LR + np.exp(LR) * (4 - 3 * LR + LR**2)) / LR**3, 1))
        f2 = dt * np.real(np.mean((2 + LR + np.exp(LR) * (-2 + LR)) / LR**3, 1))
        f3 = dt * np.real(np.mean((-4 - 3 * LR - LR**2 + np.exp(LR) * (4 - LR)) / LR**3, 1))
        g = -0.5j * k
        v = np.fft.fft(u0)
        F = np.fft.fft(af)
        for n in range(10):
            Nv = g * np.fft.fft(np.real(np.fft.ifft(v))**2)
            a = E2 * v + Q * Nv
            Na = g * np.fft.fft(np.real(np.fft.ifft(a))**2)
            b = E2 * v + Q * Na
            Nb = g * np.fft.fft(np.real(np.fft.ifft(b))**2)
            c = E2 * a + Q * (2 * Nb - Nv)
            Nc = g * np.fft.fft(np.real(np.fft.ifft(c))**2)
            v = E * v + (Nv + F) * f1 + 2 * (Na + Nb + 2 * F) * f2 + (Nc + F) * f3
        np.testing.assert_allclose(np.asarray(vv[-1]), v, atol=1e-10)


# ------------------------------------------------------------------ Diffusion

class TestDiffusion:
    def test_explicit_matches_reference_recipe(self):
        # diffusion_errors/plotErrors.py:40-48 re-simulation recipe
        for N in (8, 16, 32, 128):
            L, dt, nu = 2 * np.pi, 0.01, 0.1
            x = np.linspace(0, L, N, endpoint=False)
            u0 = np.sin(x * 2 * np.pi / L)
            cfg = diffusion.DiffusionConfig(N=N, L=L, dt=dt, nu=nu)
            st = diffusion.init(cfg, jnp.asarray(u0))
            final, uu = diffusion.simulate(cfg, st, 300)
            # oracle
            u = u0.copy()
            for n in range(300):
                u = u + dt * nu * (np.roll(u, 1) - 2 * u + np.roll(u, -1)) / (L / N)**2
            np.testing.assert_allclose(np.asarray(uu[-1]), u, atol=1e-13)
            # analytical decay (Diffusion.py:301-303)
            sol = np.asarray(diffusion.analytical_sinus(final, cfg))
            want_sol = u0 * np.exp(-(2 * np.pi / L)**2 * nu * 3.0)
            np.testing.assert_allclose(sol, want_sol, rtol=1e-10)

    def test_implicit_fourier_equals_dense_solve(self, rng):
        # circulant Fourier solve == np.linalg.solve of the periodic tridiagonal
        # (Diffusion.py:137-149)
        N, L, dt, nu = 32, 2 * np.pi, 0.05, 0.3
        u0 = rng.standard_normal(N)
        cfg = diffusion.DiffusionConfig(N=N, L=L, dt=dt, nu=nu, implicit=True)
        st = diffusion.init(cfg, jnp.asarray(u0))
        got = np.asarray(diffusion.fd_step(cfg, st))
        c = dt * nu / (L / N)**2
        M = np.diag(np.full(N, 1 + 2 * c)) + np.diag(np.full(N - 1, -c), 1) + np.diag(np.full(N - 1, -c), -1)
        M[0, -1] = -c
        M[-1, 0] = -c
        np.testing.assert_allclose(got, np.linalg.solve(M, u0), atol=1e-11)

    def test_action_step_matches_dense_matrix(self, rng):
        # Diffusion.py:176-206
        N, L, dt, nu = 16, 2 * np.pi, 0.01, 0.1
        u0 = rng.standard_normal(N)
        a = rng.standard_normal(N)
        cfg = diffusion.DiffusionConfig(N=N, L=L, dt=dt, nu=nu)
        st = diffusion.init(cfg, jnp.asarray(u0))
        new, aux = diffusion.step(cfg, st, jnp.asarray(a))
        M = np.zeros((N, N))
        for kk in range(N):
            M[kk, kk] = a[kk]
            M[kk, (kk + 1) % N] = -a[kk] / 2
            M[kk, (kk - 1) % N] = -a[kk] / 2
        want = u0 + dt * nu * (M @ u0) / (L / N)**2
        np.testing.assert_allclose(np.asarray(new.u), want, atol=1e-13)
        np.testing.assert_allclose(np.asarray(aux["gradient"]), M @ u0, atol=1e-13)

    def test_error_mode_matches_dense_matrix(self, rng):
        # DiffusionError.py:180-198
        N, L, dt, nu = 16, 2 * np.pi, 0.01, 0.1
        u0 = rng.standard_normal(N)
        a = 0.1 * rng.standard_normal(N)
        cfg = diffusion.DiffusionConfig(N=N, L=L, dt=dt, nu=nu)
        st = diffusion.init(cfg, jnp.asarray(u0))
        new, _ = diffusion.step(cfg, st, jnp.asarray(a), error_mode=True)
        M = np.zeros((N, N))
        for kk in range(N):
            M[kk, kk] = -2 + a[kk]
            M[kk, (kk + 1) % N] = 1 - a[kk] / 2
            M[kk, (kk - 1) % N] = 1 - a[kk] / 2
        want = u0 + dt * nu * (M @ u0) / (L / N)**2
        np.testing.assert_allclose(np.asarray(new.u), want, atol=1e-13)

    def test_exact_stencil_action_equals_fd_step(self):
        # action a=-2 reproduces the plain explicit FD step
        N, L = 32, 2 * np.pi
        x = np.linspace(0, L, N, endpoint=False)
        u0 = np.sin(x)
        cfg = diffusion.DiffusionConfig(N=N, L=L, dt=0.01, nu=0.1)
        st = diffusion.init(cfg, jnp.asarray(u0))
        with_action, _ = diffusion.step(cfg, st, jnp.full(N, -2.0))
        plain, _ = diffusion.step(cfg, st)
        np.testing.assert_allclose(np.asarray(with_action.u), np.asarray(plain.u), atol=1e-14)


# ------------------------------------------------------------------ Advection

class TestAdvection:
    def test_lax_matches_oracle_and_decays_to_analytical(self):
        # advection_errors recipe: N in {8,16,128}, nu=0.5, T=2*pi/nu, 200 steps
        N, L, nu = 16, 2 * np.pi, 0.5
        T = 2 * np.pi / nu
        nsteps = 200
        dt = T / nsteps
        x = np.linspace(0, L, N, endpoint=False)
        u0 = np.sin(x * 2 * np.pi / L)
        cfg = advection.AdvectionConfig(N=N, L=L, dt=dt, nu=nu)
        st = advection.init(cfg, jnp.asarray(u0))
        final, uu = advection.simulate(cfg, st, nsteps)
        # oracle (Advection.py:138-152)
        alpha = nu * dt / (L / N)
        u = u0.copy()
        for n in range(nsteps):
            u = (0.5 + 0.5 * alpha) * np.roll(u, 1) + (0.5 - 0.5 * alpha) * np.roll(u, -1)
        np.testing.assert_allclose(np.asarray(uu[-1]), u, atol=1e-13)
        # analytical: after one period the wave returns (with Lax damping)
        sol = np.asarray(advection.analytical_sinus(final, cfg))
        np.testing.assert_allclose(sol, u0, atol=1e-10)

    def test_exact_lax_action_equals_fd_step(self):
        N, L, nu, dt = 16, 2 * np.pi, 0.5, 0.05
        x = np.linspace(0, L, N, endpoint=False)
        u0 = np.sin(x)
        cfg = advection.AdvectionConfig(N=N, L=L, dt=dt, nu=nu)
        st = advection.init(cfg, jnp.asarray(u0))
        alpha = cfg.alpha
        # global mode: a0 -> u_{i-1}, a1 -> u_{i+1}
        got, _ = advection.step(cfg, st, (0.5 + 0.5 * alpha, 0.5 - 0.5 * alpha),
                                pointwise=False)
        plain, _ = advection.step(cfg, st)
        np.testing.assert_allclose(np.asarray(got.u), np.asarray(plain.u), atol=1e-14)
        # pointwise mode maps a0 -> u_{i+1}: swap to reproduce Lax
        a0 = jnp.full(N, 0.5 - 0.5 * alpha)
        a1 = jnp.full(N, 0.5 + 0.5 * alpha)
        got2, _ = advection.step(cfg, st, (a0, a1), pointwise=True)
        np.testing.assert_allclose(np.asarray(got2.u), np.asarray(plain.u), atol=1e-14)

    def test_pointwise_matches_dense_matrix(self, rng):
        # Advection.py:171-194
        N, L, dt, nu = 8, 2 * np.pi, 0.05, 0.5
        u0 = rng.standard_normal(N)
        a0 = rng.standard_normal(N)
        a1 = rng.standard_normal(N)
        cfg = advection.AdvectionConfig(N=N, L=L, dt=dt, nu=nu)
        st = advection.init(cfg, jnp.asarray(u0))
        new, _ = advection.step(cfg, st, (jnp.asarray(a0), jnp.asarray(a1)))
        M = np.zeros((N, N))
        for kk in range(N):
            M[kk, kk] = 1 - a0[kk] - a1[kk]
            M[kk, (kk + 1) % N] = a0[kk]
            M[kk, (kk - 1) % N] = a1[kk]
        np.testing.assert_allclose(np.asarray(new.u), M @ u0, atol=1e-13)


# -------------------------------------------------------------------- Laplace

class TestLaplace:
    def test_action_step_matches_dense_matrix(self, rng):
        # Laplace.py:116-141
        na = 7
        cfg = laplace.LaplaceConfig(num_agents=na, dt=0.01)
        N = cfg.N
        u0 = rng.standard_normal(N)
        f = rng.standard_normal(N)
        acts = rng.standard_normal((na, 3))
        st = laplace.init(cfg, jnp.asarray(u0), jnp.asarray(f))
        new, _ = laplace.step(cfg, st, jnp.asarray(acts))
        M = np.zeros((N, N))
        for i in range(na):
            M[i + 1, i % N] = acts[i, 0]
            M[i + 1, i + 1] = acts[i, 1]
            M[i + 1, (i + 2) % N] = acts[i, 2]
        want = u0 + 0.01 * (M @ u0)
        want[0] = 1.0
        np.testing.assert_allclose(np.asarray(new.u), want, atol=1e-13)

    def test_exact_stencil_converges_to_poisson_solution(self):
        # agents outputting the true FD laplacian stencil drive the residual down
        na = 31
        cfg = laplace.LaplaceConfig(num_agents=na, dt=0.002)
        N = cfg.N
        g = cfg.grid
        x = jnp.asarray(g.x)
        f = np.asarray(jnp.sin(x * 2 * np.pi / cfg.L))
        st = laplace.init(cfg, jnp.ones(N), jnp.asarray(f))
        dx2 = g.dx**2
        stencil = jnp.asarray(np.tile([1 / dx2, -2 / dx2, 1 / dx2], (na, 1)))
        # pseudo-time: u += dt*(lap(u)); subtracting f requires the direct-reward residual
        r0 = -np.asarray(laplace.direct_reward(cfg, st)).mean()

        def body(s, _):
            s, _aux = laplace.step(cfg, s, stencil)
            return s, None

        st2, _ = jax.lax.scan(body, st, None, length=2000)
        assert np.isfinite(np.asarray(st2.u)).all()

    def test_get_state_layout(self, rng):
        na = 4
        cfg = laplace.LaplaceConfig(num_agents=na)
        u0 = rng.standard_normal(cfg.N)
        f = rng.standard_normal(cfg.N)
        st = laplace.init(cfg, jnp.asarray(u0), jnp.asarray(f))
        s = np.asarray(laplace.get_state(cfg, st))
        assert s.shape == (na, 4)
        np.testing.assert_allclose(s[0], [u0[-1], u0[0], u0[1], f[0]])
        np.testing.assert_allclose(s[2], [u0[1], u0[2], u0[3], f[2]])


class TestBurgerCoeffs:
    """Altered-coefficients linear symbol (Burger.py:160-175): vestigial in
    the reference's Burgers variants (self.l is computed but the ABCN update
    at Burger.py:486-489 never reads it); here it is functional — the CN
    factor becomes 0.5*dt*l."""

    def test_identity_coeffs_reproduce_default(self):
        from marlpde_tpu.solvers import burger
        nu = 0.05
        # l = -c0 - c1*i*k + (1+c2)k^2 + c3*i*k^3 - (1+c4)k^4 == nu*k^2
        coeffs = (0.0, 0.0, nu - 1.0, 0.0, -1.0)
        cfg0 = burger.BurgerConfig(N=32, dt=1e-3, nu=nu)
        cfg1 = burger.BurgerConfig(N=32, dt=1e-3, nu=nu, coeffs=coeffs)
        rng = np.random.default_rng(0)
        u0 = jnp.asarray(rng.standard_normal(32).astype(np.float32)) * 0.1
        s0 = burger.init(cfg0, u0=u0)
        s1 = burger.init(cfg1, u0=u0)
        for _ in range(20):
            s0, _ = burger.step(cfg0, s0)
            s1, _ = burger.step(cfg1, s1)
        np.testing.assert_allclose(np.asarray(s1.u), np.asarray(s0.u),
                                   atol=1e-6)

    def test_symbol_formula(self):
        from marlpde_tpu.solvers import burger
        k = np.fft.fftfreq(16, 1.0 / 16)
        c = (0.3, -0.2, 0.1, 0.4, 0.5)
        l = burger.linear_symbol(c, k)
        want = (-0.3 + 0.2j * k + 1.1 * k**2 + 0.4j * k**3 - 1.5 * k**4)
        np.testing.assert_allclose(l, want, rtol=1e-12)

    def test_altered_symbol_changes_dynamics(self):
        from marlpde_tpu.solvers import burger
        cfg0 = burger.BurgerConfig(N=32, dt=1e-4, nu=0.05)
        # extra 4th-order damping: c4 > -1 adds -(1+c4)k^4... keep it small
        cfg1 = burger.BurgerConfig(N=32, dt=1e-4, nu=0.05,
                                   coeffs=(0.0, 0.0, -0.95, 0.0, -1.001))
        rng = np.random.default_rng(1)
        u0 = jnp.asarray(rng.standard_normal(32).astype(np.float32)) * 0.1
        s0 = burger.init(cfg0, u0=u0)
        s1 = burger.init(cfg1, u0=u0)
        for _ in range(10):
            s0, _ = burger.step(cfg0, s0)
            s1, _ = burger.step(cfg1, s1)
        assert np.isfinite(np.asarray(s1.u)).all()
        assert np.abs(np.asarray(s1.u) - np.asarray(s0.u)).max() > 1e-7
