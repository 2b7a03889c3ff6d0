"""Initial conditions for all solver families.

Parity targets:
  * Burger 'sinus'      sin(4*pi*(x+offset)/L)                    (Burger.py:224)
  * Burger 'turbulence' LCG-phase k^-5/3 spectrum + RMS rescale   (Burger.py:227-259)
  * Burger 'forced'     seeded-normal low-amp random field        (Burger.py:265-273)
  * KS 'noise'          N(0, 1e-3)                                (KS.py:173-175)
  * Diffusion 'box'/'sinus'/'gaussian'                            (Diffusion.py:98-113)
  * Advection 'sinus'                                             (Advection.py:107-108)

The turbulence IC's LCG (a=1103515245, c=12345, m=2^13) is evaluated in closed
form (a^k and c*sum a^j precomputed mod m) so a whole batch of envs can build
ICs with one fused elementwise pass + one matvec — no sequential scan.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2**13


@lru_cache(maxsize=32)
def _lcg_closed_form(nk: int):
    """Precompute (a^k mod m, c*sum_{j<k} a^j mod m) for k = 1..nk as numpy arrays."""
    ak = np.zeros(nk, dtype=np.int64)
    ck = np.zeros(nk, dtype=np.int64)
    # state after (i+1) LCG applications: rng_{i+1} = a^{i+1}*rng0 + c*(a^i + ... + 1)
    a_pow, c_sum = 1, 0
    for i in range(nk):
        a_pow = (a_pow * LCG_A) % LCG_M
        c_sum = (c_sum * LCG_A + LCG_C) % LCG_M
        ak[i] = a_pow
        ck[i] = c_sum
    return ak, ck


def turbulence_phases(tseed, N: int):
    """Phases of the reference turbulence IC for wavenumbers k=1..N-1.

    rng_0 = 123456789 + tseed; rng_k = (a*rng_{k-1} + c) mod m; phase_k = rng_k/m * 2*pi.
    `tseed` may be a traced scalar (vmappable).
    """
    ak, ck = _lcg_closed_form(N - 1)
    # all intermediates < 2^27, so int32 arithmetic is exact
    rng0 = (123456789 + jnp.asarray(tseed, dtype=jnp.int32)) % LCG_M
    rng_k = (jnp.asarray(ak, jnp.int32) * rng0 + jnp.asarray(ck, jnp.int32)) % LCG_M
    ftype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    return rng_k.astype(ftype) / LCG_M * 2.0 * np.pi


def burger_turbulence(tseed, offset, x, L, dtype=None):
    """Reference turbulence IC (Burger.py:227-259), fully vectorized.

    u0 = 1 + sum_{k=1}^{N-1} sqrt(2*Ek) sin(k*2*pi*(x+offset)/L + phase_k),
    Ek = 5^{-5/3} for k<=5 else k^{-5/3}; then RMS-rescaled into [0.65, 0.75]
    with the reference's capped fixed-point loop.
    """
    N = x.shape[-1]
    dtype = dtype or x.dtype
    kk = jnp.arange(1, N, dtype=dtype)
    Ek = jnp.where(kk <= 5, 5.0 ** (-5.0 / 3.0), kk ** (-5.0 / 3.0))
    w = jnp.sqrt(2.0 * Ek)
    phases = turbulence_phases(tseed, N).astype(dtype)
    theta = kk[:, None] * (2.0 * np.pi * (x + offset) / L)[None, :] + phases[:, None]
    u0 = 1.0 + w @ jnp.sin(theta)

    def rms(u):
        return jnp.sqrt(jnp.sum((u - 1.0) ** 2) / N)

    def cond(carry):
        u, crit, i = carry
        return ((crit < 0.65) | (crit > 0.75)) & (i <= 100)

    def body(carry):
        u, crit, i = carry
        u = u * (0.7 / crit)
        return u, rms(u), i + 1

    u0, _, _ = jax.lax.while_loop(cond, body, (u0, rms(u0), jnp.int32(0)))
    return u0


def burger_turbulence_numpy(tseed, offset, x, L):
    """Host float64 version of the turbulence IC (bit-parity with the LCG loop)."""
    x = np.asarray(x, np.float64)
    N = x.shape[-1]
    rng = 123456789 + int(tseed)
    u0 = np.ones(N)
    for k in range(1, N):
        rng = (LCG_A * rng + LCG_C) % LCG_M
        phase = rng / LCG_M * 2.0 * np.pi
        Ek = 5.0 ** (-5.0 / 3.0) if k <= 5 else k ** (-5.0 / 3.0)
        u0 += np.sqrt(2 * Ek) * np.sin(k * 2 * np.pi * (x + offset) / L + phase)
    idx = 0
    criterion = np.sqrt(np.sum((u0 - 1.0) ** 2) / N)
    while criterion < 0.65 or criterion > 0.75:
        u0 *= 0.7 / criterion
        criterion = np.sqrt(np.sum((u0 - 1.0) ** 2) / N)
        idx += 1
        if idx > 100:
            break
    return u0


def burger_sinus(offset, x, L):
    """sin(4*pi*(x+offset)/L)   (Burger.py:224)"""
    return jnp.sin(4.0 * np.pi * (x + offset) / L)


def burger_forced(key, x, L):
    """Random low-amplitude field (Burger.py:265-273), jax.random variant.

    The reference draws (r1, r2) ~ N(0,1) per wavenumber from numpy's global
    MT19937; here they come from an explicit key. For bit-parity injection, use
    `burger_forced_numpy`.
    """
    N = x.shape[-1]
    A = 1.0 / N
    r = jax.random.normal(key, (2, N - 1), dtype=x.dtype)
    kk = jnp.arange(1, N, dtype=x.dtype)
    theta = 2.0 * np.pi * (kk[:, None] * x[None, :] / L + r[1][:, None])
    return (r[0] * A) @ jnp.sin(theta)


def burger_forced_numpy(seed, x, L):
    """Bit-parity version of the 'forced' IC, drawing from numpy like the reference."""
    np.random.seed(seed)
    N = x.shape[-1]
    A = 1.0 / N
    u0 = np.zeros(N)
    for k in range(1, N):
        r1 = np.random.normal(loc=0.0, scale=1.0)
        r2 = np.random.normal(loc=0.0, scale=1.0)
        u0 += r1 * A * np.sin(2.0 * np.pi * (k * x / L + r2))
    return u0


def ks_noise(key, N, dtype=jnp.float32):
    """KS noisy IC: N(0, 1e-3)   (KS.py:173-175)"""
    return 1e-3 * jax.random.normal(key, (N,), dtype=dtype)


def diffusion_box(offset, x, L):
    """Box: 1 on |x - L/2 - offset| < L/8   (Diffusion.py:102-104)"""
    return jnp.where(jnp.abs(x - L / 2.0 - offset) < L / 8.0, 1.0, 0.0).astype(x.dtype)


def diffusion_sinus(offset, x, L):
    """sin((x - offset)*2*pi/L)   (Diffusion.py:108, Advection.py:108)"""
    return jnp.sin((x - offset) * 2.0 * np.pi / L)


def diffusion_gaussian(offset, x, L):
    """exp(-0.5*(L/2 + offset - x)^2)   (Diffusion.py:112)"""
    return jnp.exp(-0.5 * (0.5 * L + offset - x) ** 2)


def laplace_ic(kind, x):
    """Laplace initial fields (Laplace.py:50-57)."""
    if kind == "zero":
        return jnp.zeros_like(x)
    if kind == "one":
        return jnp.ones_like(x)
    if kind == "sin":
        return 1.0 + jnp.sin(x)
    if kind == "cos":
        return jnp.cos(x)
    raise ValueError(f"[ic] unknown laplace ic: {kind}")


def laplace_force(kind, key, offset, x, L):
    """Laplace source terms (Laplace.py:63-96). `key` only used by random kinds."""
    if kind == "zero":
        return jnp.zeros_like(x)
    if kind == "sin":
        return jnp.sin((x - offset) * 2.0 * np.pi / L)
    if kind == "cos":
        return jnp.cos((x - offset) * 2.0 * np.pi / L)
    if kind == "sincos":
        pick = jax.random.uniform(key) > 0.5
        return jnp.where(pick,
                         jnp.sin((x - offset) * 2.0 * np.pi / L),
                         jnp.cos((x - offset) * 2.0 * np.pi / L))
    if kind == "fourier":
        r = jax.random.uniform(key)
        branches = [
            lambda: jnp.sin((x - offset) * 2.0 * np.pi / L),
            lambda: jnp.sin((x - offset) * 3.0 * np.pi / L),
            lambda: jnp.sin((x - offset) * 4.0 * np.pi / L),
        ]
        idx = jnp.where(r > 0.66, 0, jnp.where(r > 0.33, 1, 2))
        return jax.lax.switch(idx, branches)
    if kind == "gaussian":
        return jnp.exp(-0.5 * (0.5 * L - x + offset) ** 2)
    raise ValueError(f"[ic] unknown laplace force: {kind}")
