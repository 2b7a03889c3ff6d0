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


def make_movie_field(x_list, uu_list, tt, fname="evolution.gif",
                     num_frames=100, ylim=(-1.0, 2.75), fps=20):
    """Field-evolution movie (makeMovieField, plotting.py:35-67).

    Overlays several trajectories per frame.  Data-array API: ``x_list[i]`` is
    model i's grid, ``uu_list[i]`` its (T+1, N) trajectory; ``tt`` the shared
    time vector.  Writes an animated GIF (reference assembles per-frame PNGs
    with imageio; here one matplotlib animation).
    """
    from matplotlib import animation
    plt = _plt()
    colors = ["royalblue", "coral"]          # plotting.py:38-39
    alphas = [1.0, 0.8]
    tt = np.asarray(tt)
    num_frames = min(num_frames, len(tt))
    fidx = np.linspace(0, len(tt) - 1, num_frames).astype(int)

    fig, ax = plt.subplots()
    lines = [ax.plot([], [], "-", color=colors[i % 2], alpha=alphas[i % 2])[0]
             for i in range(len(uu_list))]
    ax.set_xlim(min(np.min(x) for x in x_list), max(np.max(x) for x in x_list))
    ax.set_ylim(*ylim)                        # plotting.py:55
    txt = ax.text(0.75, 0.9, "", transform=ax.transAxes, fontsize=12)

    def draw(j):
        t = tt[fidx[j]]
        for ln, x, uu in zip(lines, x_list, uu_list):
            ln.set_data(np.asarray(x), np.asarray(uu)[fidx[j]])
        txt.set_text(f"t={t:.2f}")
        return lines + [txt]

    ani = animation.FuncAnimation(fig, draw, frames=num_frames, blit=True)
    ani.save(fname, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return fname


def make_movie_spectrum(k_list, ek_ktt_list, tt, fname="evolution_spectrum.gif",
                        num_frames=100, ylim=(1e-7, 1.0), fps=20):
    """Spectrum-evolution movie (makeMovieSpectrum, plotting.py:69-104):
    log-log E(k) up to the coarsest model's Nyquist, one frame per time."""
    from matplotlib import animation
    plt = _plt()
    colors = ["royalblue", "coral"]
    alphas = [1.0, 0.8]
    tt = np.asarray(tt)
    num_frames = min(num_frames, len(tt))
    fidx = np.linspace(0, len(tt) - 1, num_frames).astype(int)
    half = min(np.asarray(ek).shape[-1] for ek in ek_ktt_list) // 2  # :80,88

    fig, ax = plt.subplots()
    lines = [ax.plot([], [], "-", color=colors[i % 2], alpha=alphas[i % 2])[0]
             for i in range(len(ek_ktt_list))]
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlim(1, max(half, 2))
    ax.set_ylim(*ylim)                        # plotting.py:94
    txt = ax.text(0.75, 0.9, "", transform=ax.transAxes, fontsize=12)

    def draw(j):
        for ln, k, ek in zip(lines, k_list, ek_ktt_list):
            kk = np.abs(np.asarray(k)[1:half])
            ln.set_data(kk, np.asarray(ek)[fidx[j], 1:half])
        txt.set_text(f"t={tt[fidx[j]]:.2f}")
        return lines + [txt]

    ani = animation.FuncAnimation(fig, draw, frames=num_frames, blit=True)
    ani.save(fname, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return fname


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


def plot_episode_dumps(npz_glob: str, out_prefix: str = "episode",
                       action_range=(-4.0, 4.0)):
    """Post-hoc plots from episode dumps (plotEpisode.py:24-52).

    Loads every npz matching ``npz_glob`` (the trainer's --save-episodes
    output or evaluation dumps), then writes (i) a reward-trajectory quantile
    fan (median + 20/80% band, plotEpisode.py:25-37) and (ii) a KDE of the
    action (SGS-forcing) distribution (plotEpisode.py:40-52).
    Returns the two written filenames."""
    import glob as _glob

    from scipy.stats import gaussian_kde
    plt = _plt()
    files = sorted(_glob.glob(npz_glob))
    if not files:
        raise FileNotFoundError(f"[plotting] no episode dumps match {npz_glob}")
    rewards, actions = [], []
    for f in files:
        d = np.load(f)
        rewards.append(np.asarray(d["rewards"]).reshape(
            d["rewards"].shape[0], d["rewards"].shape[1], -1).mean(-1))
        actions.append(np.asarray(d["actions"]).reshape(-1))
    rewards = np.concatenate(rewards, axis=0)      # (episodes, T)
    actions = np.concatenate(actions)

    fq = f"{out_prefix}_quantiles.png"
    fig, ax = plt.subplots()
    t = np.arange(rewards.shape[1])
    ax.plot(t, np.quantile(rewards, 0.5, axis=0), color="coral")
    ax.fill_between(t, np.quantile(rewards, 0.2, axis=0),
                    np.quantile(rewards, 0.8, axis=0), color="coral", alpha=0.2)
    ax.set_xlabel("macro-step")
    ax.set_ylabel("reward")
    fig.tight_layout()
    fig.savefig(fq)
    plt.close(fig)

    fk = f"{out_prefix}_action_kde.png"
    fig, ax = plt.subplots()
    svals = np.linspace(action_range[0], action_range[1], 500)
    if actions.std() > 0:
        ax.plot(svals, gaussian_kde(actions)(svals))
        ax.set_yscale("log")
    else:                                  # degenerate (e.g. all-zero) dump
        ax.hist(actions, bins=50)
    ax.set_xlabel("action")
    fig.tight_layout()
    fig.savefig(fk)
    plt.close(fig)
    return fq, fk


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


def plot_evolution_panels(x, tt, uu, solution=None, fname="evolution.png"):
    """2x3 field-vs-solution snapshot panels (plotting_diffusion.py:13-33
    plotEvolution): 6 equally spaced times, solved field solid, analytical
    solution dashed."""
    plt = _plt()
    uu = np.asarray(uu)
    fig, axs = plt.subplots(2, 3, sharex=True, sharey=True)
    T = len(uu)
    for i in range(6):
        tidx = min(int(i * T / 6), T - 1)
        ax = axs[i // 3, i % 3]
        ax.plot(x, uu[tidx], "-", color="royalblue")
        if solution is not None:
            ax.plot(x, np.asarray(solution)[tidx], "--", color="coral")
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)


def plot_action_contour(x, tt, action_fields, fname="actionfield.png"):
    """contourf of the action field over (x, t)
    (plotting_diffusion.py:91-103 plotActionField)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 6))
    c = ax.contourf(x, tt, np.asarray(action_fields))
    fig.colorbar(c)
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)


def plot_field_contour(x, tt, uu, fname="field.png"):
    """contourf of u(x, t) (plotting_diffusion.py:105-116 plotDiffusionField —
    which contourf's actionHistory, an apparent bug; we plot the field the
    name promises)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(8, 8))
    ax.contourf(x, tt, np.asarray(uu))
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)


def plot_action_distribution(actions, fname="actiondist.png"):
    """Distribution of all executed actions (plotting_diffusion.py:118-128
    plotActionDistribution, a violin plot; rendered as KDE + histogram)."""
    from scipy.stats import gaussian_kde
    plt = _plt()
    a = np.asarray(actions).ravel()
    fig, ax = plt.subplots()
    ax.hist(a, bins=64, density=True, alpha=0.4, color="royalblue")
    if a.std() > 1e-12:
        grid = np.linspace(a.min(), a.max(), 400)
        ax.plot(grid, gaussian_kde(a)(grid), color="coral")
    ax.set_xlabel("action")
    fig.tight_layout()
    fig.savefig(fname)
    plt.close(fig)
