"""Physics diagnostics: energy spectra, SGS-term extraction, error curves.

Parity targets:
  * compute_Ek family (Ek_kt/Ek_k/Ek_t/Ek_ktt/Ek_tt)          Burger.py:541-576
  * a-priori SGS extraction, 3 filter variants                 Burger.py:677-736
  * KS SGS extraction                                          KS.py:385-409
  * solver error curves (mse/linf/mass vs t) in the schema of
    diffusion_errors/error_*.json                              plotErrors.py:40-48
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from marlpde_tpu.core import spectral


def compute_ek(vv, dx):
    """All energy forms from a spectrum trajectory vv (T+1, N) (Burger.py:541-576).

    Returns dict(Ek_kt, Ek_k, Ek_t, Ek_ktt, Ek_tt)."""
    n_frames = vv.shape[0]
    ek_kt = spectral.energy_spectrum(vv, dx)
    ek_k = ek_kt.sum(0) / n_frames
    ek_t = ek_kt.sum(1)
    ek_ktt = spectral.cumulative_mean(ek_kt, axis=0)
    ek_tt = jnp.cumsum(ek_t) / jnp.arange(1, n_frames + 1)
    return dict(Ek_kt=ek_kt, Ek_k=ek_k, Ek_t=ek_t, Ek_ktt=ek_ktt, Ek_tt=ek_tt)


def compute_sgs_burger(uu, k, dx, dt, nu, n_urg):
    """A-priori SGS terms from a stored trajectory (Burger.py:677-736), batched
    over frames.  Returns dict(sgs, sgs_alt, sgs_alt2):
      sgs     = -uh*duhdx + 0.5*du2hdx                (filtered advective form)
      sgs_alt = duhdt + uh*duhdx - nu*d2uhdx2         (residual form, same grid)
      sgs_alt2= the same residual on the restricted (n_urg) grid
    """
    uu = jnp.asarray(uu)
    n_frames, N = uu.shape
    keep = jnp.abs(jnp.asarray(k)) <= n_urg // 2
    r = n_urg / N

    vv = spectral.fft(uu)
    vv2 = spectral.fft(uu * uu)
    uh = spectral.irfft_real(vv * keep)
    u2h = spectral.irfft_real(vv2 * keep)

    # restricted-grid variant (Burger.py:695,710): bare mode slices, then *r
    uh_alt2 = spectral.irfft_real(
        jnp.concatenate([vv[:, :(n_urg + 1) // 2], vv[:, N - n_urg // 2:]], axis=1)) * r

    # time derivatives: forward diff, last frame backward*(-1) (Burger.py:686,714-716)
    duhdt = (jnp.roll(uh, -1, 0) - uh) / dt
    duhdt = duhdt.at[-1].set((uh[-2] - uh[-1]) / dt * -1.0)
    duhdt_alt2 = (jnp.roll(uh_alt2, -1, 0) - uh_alt2) / dt
    duhdt_alt2 = duhdt_alt2.at[-1].set((uh_alt2[-2] - uh_alt2[-1]) / dt * -1.0)

    def d1(a, h):
        return (a - jnp.roll(a, 1, -1)) / h

    def d2(a, h):
        return (jnp.roll(a, -1, -1) - 2 * a + jnp.roll(a, 1, -1)) / h**2

    duhdx = d1(uh, dx)
    d2uhdx2 = d2(uh, dx)
    du2hdx = d1(u2h, dx)
    duhdx_alt2 = d1(uh_alt2, dx) * r
    d2uhdx2_alt2 = d2(uh_alt2, dx) * r * r

    sgs = -uh * duhdx + 0.5 * du2hdx
    sgs_alt = duhdt + uh * duhdx - nu * d2uhdx2
    sgs_alt2 = duhdt_alt2 + uh_alt2 * duhdx_alt2 - nu * d2uhdx2_alt2
    return dict(sgs=sgs, sgs_alt=sgs_alt, sgs_alt2=sgs_alt2)


def compute_sgs_ks(uu, k, dx, n_urg):
    """KS a-priori SGS: -uh*duhdx + 0.5*du2hdx (KS.py:385-409)."""
    uu = jnp.asarray(uu)
    keep = jnp.abs(jnp.asarray(k)) <= n_urg // 2
    uh = spectral.irfft_real(spectral.fft(uu) * keep)
    u2h = spectral.irfft_real(spectral.fft(uu * uu) * keep)
    duhdx = (uh - jnp.roll(uh, 1, -1)) / dx
    du2hdx = (u2h - jnp.roll(u2h, 1, -1)) / dx
    return -uh * duhdx + 0.5 * du2hdx


def sgs_correlation(sgs_true, sgs_model):
    """Pearson correlation of SGS terms (other/correlation.py:16): scalar in [-1,1]."""
    a = np.asarray(sgs_true).ravel()
    b = np.asarray(sgs_model).ravel()
    return float(np.corrcoef(a, b)[0, 1])


def error_curves(uu, solution, tt):
    """mse/linf/mass curves in the error_*.json schema
    (diffusion_errors/plotErrors.py:40-48)."""
    uu = np.asarray(uu)
    sol = np.asarray(solution)
    return dict(
        t=np.asarray(tt).tolist(),
        mse=np.mean((uu - sol) ** 2, axis=1).tolist(),
        linf=np.amax(np.abs(uu - sol), axis=1).tolist(),
        mass=np.sum(uu, axis=1).tolist())


def write_error_json(path: str, curves: dict):
    with open(path, "w") as f:
        json.dump(curves, f)


def load_reference_error_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
