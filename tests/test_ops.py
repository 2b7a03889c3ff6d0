"""ops-layer tests: DFT-as-matmul correctness against numpy FFT."""

import jax.numpy as jnp
import numpy as np

from marlpde_tpu.ops import dft


class TestDftMatmul:
    def test_forward_real_matches_numpy(self, rng):
        x = rng.standard_normal((5, 32))
        re, im = dft.dft(jnp.asarray(x))
        want = np.fft.fft(x, axis=-1)
        np.testing.assert_allclose(np.asarray(re), want.real, atol=1e-10)
        np.testing.assert_allclose(np.asarray(im), want.imag, atol=1e-10)

    def test_forward_complex_matches_numpy(self, rng):
        x = rng.standard_normal((3, 16)) + 1j * rng.standard_normal((3, 16))
        re, im = dft.dft(jnp.asarray(x.real), jnp.asarray(x.imag))
        want = np.fft.fft(x, axis=-1)
        np.testing.assert_allclose(np.asarray(re), want.real, atol=1e-10)
        np.testing.assert_allclose(np.asarray(im), want.imag, atol=1e-10)

    def test_inverse_roundtrip(self, rng):
        x = rng.standard_normal((4, 64)) + 1j * rng.standard_normal((4, 64))
        re, im = dft.dft(jnp.asarray(x.real), jnp.asarray(x.imag))
        back_re, back_im = dft.idft(re, im)
        np.testing.assert_allclose(np.asarray(back_re), x.real, atol=1e-10)
        np.testing.assert_allclose(np.asarray(back_im), x.imag, atol=1e-10)

    def test_idft_real_of_nonhermitian(self, rng):
        v = rng.standard_normal(32) + 1j * rng.standard_normal(32)
        got = dft.idft_real(jnp.asarray(v.real), jnp.asarray(v.imag))
        np.testing.assert_allclose(np.asarray(got),
                                   np.real(np.fft.ifft(v)), atol=1e-12)


class TestDftSolverParity:
    def test_abcn_dft_impl_matches_fft_impl(self):
        import jax
        from marlpde_tpu.core import ic
        from marlpde_tpu.solvers import burger
        N, L = 32, 2 * np.pi
        x = jnp.asarray(np.linspace(0, L, N, endpoint=False))
        u0 = ic.burger_turbulence(5, 0.0, x, L)
        c1 = burger.BurgerConfig(N=N, L=L, dt=1e-3, nu=0.02, fft_impl="fft")
        c2 = burger.BurgerConfig(N=N, L=L, dt=1e-3, nu=0.02, fft_impl="dft")
        _, uu1, _ = burger.simulate(c1, burger.init(c1, u0=u0), 100)
        _, uu2, _ = burger.simulate(c2, burger.init(c2, u0=u0), 100)
        np.testing.assert_allclose(np.asarray(uu2), np.asarray(uu1), atol=1e-8)
