"""On-device interpolation of ground-truth trajectories.

The reference interpolates DNS truth with scipy ``interp2d`` — cubic for
Burgers/KS (Burger.py:323, KS.py:223), linear for diffusion/advection
(Diffusion.py:132).  Queries always land on stored time slices (t = n*dt), so
time interpolation reduces to an index; only space needs real interpolation.

TPU-native replacement: a *periodic* cubic spline on the uniform grid, whose
circulant tridiagonal system (M_{j-1} + 4 M_j + M_{j+1} = 6 d2y_j) is solved in
Fourier space — one FFT per trajectory frame, batched.  This differs from
scipy's non-periodic B-spline only near the domain edges (the periodic variant
is the physically consistent one for these PDEs); parity tests bound the
difference instead of replicating scipy bug-for-bug.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def periodic_spline_m(y):
    """Second-derivative spline coefficients M (same shape as y, last axis = space).

    Solves M_{j-1} + 4*M_j + M_{j+1} = 6*(y_{j-1} - 2*y_j + y_{j+1})/h^2 with
    h=1 grid units (h factored into evaluation), via the circulant eigenvalues
    4 + 2*cos(2*pi*m/N).
    """
    N = y.shape[-1]
    d2 = jnp.roll(y, 1, axis=-1) - 2.0 * y + jnp.roll(y, -1, axis=-1)
    eig = 4.0 + 2.0 * np.cos(2.0 * np.pi * np.arange(N) / N)
    M = jnp.fft.ifft(jnp.fft.fft(6.0 * d2, axis=-1) / eig, axis=-1)
    return jnp.real(M)


def periodic_spline_eval(y, M, xq, L):
    """Evaluate the periodic cubic spline of `y` (with coeffs `M`) at points `xq`.

    y, M: (..., N) values/coefficients on x_j = j*L/N.  xq: (Q,) query points
    (any real; wrapped into [0, L)).  Returns (..., Q).
    """
    N = y.shape[-1]
    h = L / N
    s = (xq % L) / h                     # in grid units
    j = jnp.floor(s).astype(jnp.int32) % N
    t = s - jnp.floor(s)
    jp = (j + 1) % N
    yj, yjp = y[..., j], y[..., jp]
    Mj, Mjp = M[..., j], M[..., jp]
    omt = 1.0 - t
    # grid-unit spline; M carries 1/h^2 implicitly since d2 was unscaled
    return (yj * omt + yjp * t
            + ((omt**3 - omt) * Mj + (t**3 - t) * Mjp) / 6.0)


def cubic_interp(y, xq, L):
    """One-shot periodic cubic interpolation of y(..., N) at xq."""
    return periodic_spline_eval(y, periodic_spline_m(y), xq, L)


def linear_interp(y, xq, L):
    """Periodic linear interpolation of y(..., N) at query points xq (Q,).

    Matches interp2d(kind='linear') away from the last cell; the reference's
    non-periodic interpolant clamps in [x_{N-1}, L) whereas this wraps.
    """
    N = y.shape[-1]
    h = L / N
    s = (xq % L) / h
    j = jnp.floor(s).astype(jnp.int32) % N
    t = s - jnp.floor(s)
    jp = (j + 1) % N
    return y[..., j] * (1.0 - t) + y[..., jp] * t


def frame_index(t, dt, nframes):
    """Index of the stored trajectory frame at time t (t is n*dt up to fp error)."""
    return jnp.clip(jnp.round(t / dt).astype(jnp.int32), 0, nframes - 1)


def shifted_query_points(x, shift, L):
    """The reference's shifted-truth query grid (Burger.py:581-583):
    newx = x + shift, wrapped into [0, L]."""
    newx = x + shift
    newx = jnp.where(newx > L, newx - L, newx)
    newx = jnp.where(newx < 0, newx + L, newx)
    return newx
