"""Smagorinsky subgrid-scale closures (static and dynamic) as pure field maps.

Parity targets: Burger.step's ssm branch (Burger.py:337-352) and dsm branch
(Burger.py:354-408).  Both use the one-sided first derivative
dudx = (u - roll(u,1))/dx and the centered second derivative, with
delta = 2*pi/N (independent of L — reference quirk, replicated).

The reference's dsm branch filters IN PLACE through numpy aliases
(``vh = self.v; vh[hidx] = 0`` at Burger.py:369-370), which zeroes the solver
state's high modes every step as a side effect.  That cannot happen here
(functional arrays); ``dsm_forcing`` returns the filtered spectrum so the
caller can *opt in* to the reference's state-truncation behavior
(``filter_state_quirk`` in the Burgers config).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from marlpde_tpu.core import spectral


def first_deriv_onesided(u, dx):
    """(u - roll(u,1))/dx  — the reference's upwind-style dudx (Burger.py:345)."""
    return (u - jnp.roll(u, 1, axis=-1)) / dx


def second_deriv(u, dx):
    """(roll(u,-1) - 2u + roll(u,1))/dx^2 (Burger.py:346)."""
    return (jnp.roll(u, -1, axis=-1) - 2.0 * u + jnp.roll(u, 1, axis=-1)) / (dx * dx)


def ssm_forcing(u, dx, N, cs=0.1):
    """Static Smagorinsky SGS term: (cs*delta)^2*|dudx|*d2udx2 (Burger.py:337-352)."""
    delta = 2.0 * np.pi / N
    dudx = first_deriv_onesided(u, dx)
    d2udx2 = second_deriv(u, dx)
    nu_ssm = (cs * delta) ** 2 * jnp.abs(dudx)
    return nu_ssm * d2udx2


def dsm_forcing(u, v, k, dx, N):
    """Dynamic Smagorinsky (Germano-style, the reference's 'alt' estimator).

    Returns (sgs_alt, v_filtered): the SGS field added to the RHS
    (Burger.py:392-399,408) and the sharp-filtered state spectrum the
    reference leaks into ``self.v`` via aliasing.
    Test filter: zero modes with |k| > N//4, deltah = 2*delta.
    """
    delta = 2.0 * np.pi / N
    deltah = 4.0 * np.pi / N
    hidx = jnp.abs(k) > N // 4

    def filt(z):
        return jnp.where(hidx, 0.0, z)

    v2h = filt(spectral.fft(u * u))
    L1 = 0.5 * spectral.irfft_real(v2h)
    vh = filt(v)
    uh = spectral.irfft_real(vh)
    L2 = 0.5 * uh * uh
    Lg = L1 - L2                      # Germano identity residual

    dudx = first_deriv_onesided(u, dx)
    d2udx2 = second_deriv(u, dx)

    w2h = filt(spectral.fft(jnp.abs(dudx) * dudx))
    M1 = delta**2 * spectral.irfft_real(w2h)
    duhdx = first_deriv_onesided(uh, dx)
    M2 = deltah**2 * jnp.abs(duhdx) * duhdx

    H = -Lg
    malt = 4.0 / deltah**2 * M2 - 1.0 / delta**2 * M1
    Malt = (malt - jnp.roll(malt, 1, axis=-1)) / dx
    csd2alt = jnp.mean(H * Malt, axis=-1, keepdims=True) / jnp.mean(Malt * Malt, axis=-1, keepdims=True)
    nu_dsm_alt = csd2alt * jnp.abs(dudx)
    sgs_alt = nu_dsm_alt * d2udx2
    return sgs_alt, vh
