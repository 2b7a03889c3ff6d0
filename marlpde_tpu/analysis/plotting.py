"""Plotting: the reference's L4 analysis layer rebuilt on the functional data model.

Parity targets (python/_model/plotting.py):
  * plotField / plotError / plotAvgSpectrum                    :10,107,135
  * makePlot — 3x6 panel DNS/uncontrolled/SGS comparison:
    field contours, energy traces, spectra, SGS-term KDEs      :161-433
  * makeDiffusionPlot                                          :435
  * plotting_diffusion.py / plotting_laplace.py panels         :13-118 / :13-72
  * rlview-equivalent training curves (korali.rlview CLI,
    runs/burger_launcher.sh:72)

All functions take plain arrays (trajectories from simulate/rollout) rather
than solver objects, and write PNGs.  matplotlib is imported lazily with the
Agg backend so headless training never pays for it.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_field(x, u, fname="field.png", title=None):
    plt = _plt()
    fig, ax = plt.subplots()
    ax.plot(x, u)
    if title:
        ax.set_title(title)
    fig.savefig(fname)
    plt.close(fig)


def plot_error(x, err, fname="error.png"):
    plt = _plt()
    fig, ax = plt.subplots()
    ax.plot(x, err)
    ax.set_yscale("log")
    fig.savefig(fname)
    plt.close(fig)


def plot_avg_spectrum(ek_ktt_list, labels, fname="spectrum.png"):
    plt = _plt()
    fig, ax = plt.subplots()
    for ek, lab in zip(ek_ktt_list, labels):
        half = len(ek) // 2
        ax.loglog(np.arange(1, half), np.asarray(ek)[1:half], label=lab)
    ax.set_xlabel("k")
    ax.set_ylabel("E(k)")
    ax.legend()
    fig.savefig(fname)
    plt.close(fig)


def make_plot(dns, base, sgs, file_prefix="compare", spectral=True):
    """The reference's 3x6 evaluation panel (plotting.py:161-433).

    dns/base/sgs: dicts with keys
      x (N,), tt (T+1,), uu (T+1, N), ek_t (T+1,), ek_ktt (T+1, N),
      and optionally sgs_terms (T+1, N) / action_fields (T+1, N).
    Writes {file_prefix}_evolution.png.
    """
    plt = _plt()
    cases = [("DNS", dns), ("no control", base), ("controlled", sgs)]
    fig, axs = plt.subplots(3, 6, figsize=(24, 12))
    for row, (name, d) in enumerate(cases):
        uu = np.asarray(d["uu"])
        tt = np.asarray(d["tt"])
        x = np.asarray(d["x"])
        # field contour
        axs[row, 0].contourf(x, tt, uu, 32)
        axs[row, 0].set_ylabel(name)
        # mid/final field snapshots
        axs[row, 1].plot(x, uu[len(uu) // 2], label="t mid")
        axs[row, 1].plot(x, uu[-1], label="t end")
        axs[row, 1].legend()
        # total energy vs t
        axs[row, 2].plot(tt, np.asarray(d["ek_t"]))
        axs[row, 2].set_title("E(t)")
        # cumulative-avg spectrum at end
        ek = np.asarray(d["ek_ktt"])[-1]
        half = len(ek) // 2
        axs[row, 3].loglog(np.arange(1, half), ek[1:half])
        axs[row, 3].set_title("E(k)")
        # error vs DNS truth on the coarse nodes
        dns_uu = np.asarray(dns["uu"])
        stride = dns_uu.shape[1] // uu.shape[1]
        err = np.abs(uu - dns_uu[:, ::stride][: uu.shape[0]])
        axs[row, 4].plot(tt, err.mean(1))
        axs[row, 4].set_yscale("log")
        axs[row, 4].set_title("|err| vs DNS")
        # SGS-term / action distribution (KDE-style histogram)
        key = "sgs_terms" if "sgs_terms" in d else "action_fields"
        if key in d:
            vals = np.asarray(d[key]).ravel()
            axs[row, 5].hist(vals, bins=64, density=True)
            axs[row, 5].set_title(key)
    fig.tight_layout()
    fig.savefig(f"{file_prefix}_evolution.png")
    plt.close(fig)


def make_diffusion_plot(x, tt, uu, solution, fname="diffusion.png"):
    """Evolution vs analytical panels (plotting.py:435, plotting_diffusion.py:13-60)."""
    plt = _plt()
    uu = np.asarray(uu)
    sol = np.asarray(solution)
    fig, axs = plt.subplots(1, 3, figsize=(15, 4))
    for i in np.linspace(0, len(uu) - 1, 6, dtype=int):
        axs[0].plot(x, uu[i], alpha=0.4 + 0.6 * i / len(uu))
    axs[0].set_title("evolution")
    axs[1].plot(tt, np.mean((uu - sol) ** 2, axis=1))
    axs[1].set_yscale("log")
    axs[1].set_title("mse(t)")
    axs[2].plot(tt, np.sum(uu, axis=1))
    axs[2].set_title("mass(t)")
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)


def plot_action_field(x, action_fields, fname="actions.png"):
    """Mean/quantile action fields (plotting_diffusion.py:63-86)."""
    plt = _plt()
    a = np.asarray(action_fields)
    fig, ax = plt.subplots()
    ax.plot(x, a.mean(0), label="mean")
    ax.fill_between(x, np.quantile(a, 0.1, 0), np.quantile(a, 0.9, 0), alpha=0.3)
    ax.legend()
    fig.savefig(fname)
    plt.close(fig)


def plot_training_curves(history: dict, fname="training.png"):
    """korali.rlview equivalent: returns/episode-length/metrics vs experiences."""
    plt = _plt()
    fig, axs = plt.subplots(1, 3, figsize=(15, 4))
    exp = history["experiences"]
    axs[0].plot(exp, history["mean_return"])
    axs[0].set_title("mean return")
    axs[0].set_xlabel("experiences")
    axs[1].plot(exp, history["mean_ep_len"])
    axs[1].set_title("episode length")
    betas = [m.get("beta", np.nan) for m in history["metrics"]]
    axs[2].plot(exp, betas)
    axs[2].set_title("REFER beta")
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)
