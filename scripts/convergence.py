"""Grid-convergence + timing study: ABCN vs RK3 Burgers steppers.

Parity target: other/convergencerate.py — simulate a fine-grid reference with
both steppers (":118-123"), average them into a truth surface, then sweep
coarse grids N = 2^5..2^9 measuring trajectory MSE against the truth and
wall-clock per scheme (":135-160"), writing loglog MSE-vs-N and time-vs-N
plots (":162-179").  Here the steppers are the jitted lax.scan solvers
(solvers/burger.py) — one compiled program per (scheme, N) — and the cubic
interp2d downsampling is replaced by exact spectral restriction of the truth
to each coarse grid (the relation the envs use, burger_environment.py:110-112)
evaluated per saved frame.

Usage: python scripts/convergence.py [--ndns 2048] [--dt-dns 1e-4] [--dt 1e-3]
           [--tend 5.0] [--nu 0.02] [--nmin 5] [--nmax 9] [--out-dir .]
Writes convergence.json + convergencerate.png + timing.png.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run_scheme(scheme: str, N: int, L: float, dt: float, tend: float, nu: float,
               save_every: int = 1):
    """Simulate sin(x) Burgers with the given scheme; returns (x, saved uu, secs).

    The scan is jitted; timing includes compile-free steady execution only
    (one warmup call, then a timed call), matching what a production sweep
    pays per run.
    """
    from marlpde_tpu.solvers import burger

    cfg = burger.BurgerConfig(L=L, N=N, dt=dt, nu=nu, scheme=scheme)
    x = np.asarray(cfg.grid.x)
    u0 = jnp.asarray(np.sin(x))                     # convergencerate.py:13
    nsteps = int(tend / dt)

    @jax.jit
    def sim(u0_):
        st = burger.init(cfg, u0=u0_)
        _, uu, _ = burger.simulate(cfg, st, nsteps)
        return uu[::save_every]

    uu = np.asarray(jax.block_until_ready(sim(u0)))  # compile + run
    t0 = time.perf_counter()
    uu = np.asarray(jax.block_until_ready(sim(u0)))
    secs = time.perf_counter() - t0
    return x, uu, secs


def restrict(uu_fine: np.ndarray, n_coarse: int) -> np.ndarray:
    """Spectral restriction of every frame to n_coarse points
    (burger_environment.py:110-112 mode-truncation convention)."""
    g, Nf = n_coarse, uu_fine.shape[-1]
    vv = np.fft.fft(uu_fine, axis=-1)
    v0 = np.concatenate([vv[..., : (g + 1) // 2], vv[..., -(g - 1) // 2:]],
                        axis=-1) * (g / Nf)
    return np.real(np.fft.ifft(v0, axis=-1))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ndns", type=int, default=2048)
    p.add_argument("--dt-dns", type=float, default=1e-4)
    p.add_argument("--dt", type=float, default=1e-3)
    p.add_argument("--tend", type=float, default=5.0)
    p.add_argument("--nu", type=float, default=0.02)
    p.add_argument("--nmin", type=int, default=5)
    p.add_argument("--nmax", type=int, default=9)
    p.add_argument("--out-dir", type=str, default=".")
    p.add_argument("--no-plots", action="store_true")
    args = p.parse_args(argv)
    L = 2 * np.pi

    # fine-grid truth = mean of both steppers (convergencerate.py:122-144)
    sub = max(1, round(args.dt / args.dt_dns))      # align saved frames to dt
    _, dns_rk3, _ = run_scheme("rk3", args.ndns, L, args.dt_dns, args.tend,
                               args.nu, save_every=sub)
    _, dns_abcn, _ = run_scheme("abcn", args.ndns, L, args.dt_dns, args.tend,
                                args.nu, save_every=sub)
    truth = 0.5 * dns_rk3 + 0.5 * dns_abcn

    out = {"N": [], "mse_rk3": [], "mse_abcn": [], "time_rk3": [],
           "time_abcn": [], "dt": args.dt, "tend": args.tend, "nu": args.nu,
           "ndns": args.ndns}
    for i in range(args.nmin, args.nmax + 1):
        N = 2 ** i
        truth_c = restrict(truth, N)
        row = {"N": N}
        for scheme in ("rk3", "abcn"):
            _, uu, secs = run_scheme(scheme, N, L, args.dt, args.tend, args.nu)
            T = min(len(uu), len(truth_c))
            mse = float(np.mean((uu[:T] - truth_c[:T]) ** 2))
            out[f"mse_{scheme}"].append(mse)
            out[f"time_{scheme}"].append(secs)
            row[scheme] = {"mse": mse, "secs": round(secs, 4)}
        out["N"].append(N)
        print(f"[convergence] {json.dumps(row)}", file=sys.stderr, flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "convergence.json"), "w") as f:
        json.dump(out, f, indent=1)

    if not args.no_plots:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        for ykeys, ylabel, fname in (
                (("mse_rk3", "mse_abcn"), "MSE", "convergencerate.png"),
                (("time_rk3", "time_abcn"), "Time [s]", "timing.png")):
            fig, ax = plt.subplots()
            for k in ykeys:
                ax.loglog(out["N"], out[k], "-o", label=k)
            ax.set_xlabel("N")
            ax.set_ylabel(ylabel)
            ax.grid(True)
            ax.legend()
            fig.tight_layout()
            fig.savefig(os.path.join(args.out_dir, fname))
            plt.close(fig)
    print(json.dumps({"wrote": ["convergence.json", "convergencerate.png",
                                "timing.png"], "out_dir": args.out_dir}))


if __name__ == "__main__":
    main()
