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
