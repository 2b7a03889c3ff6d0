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


def _interp_dns(dns_x, dns_tt, dns_uu, x, tt):
    """Cubic interpolation of the DNS field onto (tt, x) — the reference's
    interpolate.interp2d(dns.x, dns.tt, dns.uu, kind='cubic')
    (plotting.py:233-245).  Periodic in x via a wrapped ghost column."""
    from scipy.interpolate import RectBivariateSpline
    xg = np.concatenate([dns_x, [dns_x[0] + (dns_x[-1] - dns_x[0])
                                 + (dns_x[1] - dns_x[0])]])
    ug = np.concatenate([dns_uu, dns_uu[:, :1]], axis=1)
    kt = min(3, len(dns_tt) - 1)
    f = RectBivariateSpline(np.asarray(dns_tt), xg, ug, kx=kt, ky=3)
    tt_c = np.clip(np.asarray(tt), dns_tt[0], dns_tt[-1])
    return f(tt_c, np.asarray(x))


def _align_dns_frames(dns_tt, tt):
    """DNS frame index nearest each LES output time (plotting.py:232 tidx)."""
    dns_tt = np.asarray(dns_tt)
    return np.clip(np.searchsorted(dns_tt, np.asarray(tt) - 1e-12),
                   0, len(dns_tt) - 1)


def make_plot(dns, base, sgs, file_prefix="compare", spectral=True):
    """The reference's makePlot artifact set (plotting.py:161-433):

      {prefix}_evolution.png   4x4 field snapshots — baseline & controlled
                               solid, DNS dashed (plotting.py:165-190)
      {prefix}.png             3x6 panels — field contour | |err vs cubic-
                               interpolated DNS| contour | instantaneous +
                               cumulative error trace (spectral or MSE) |
                               Ek_ktt spectra at start/mid/end (k^-2 guide on
                               the DNS row) | relative spectrum error at
                               start/mid/end | per-action trajectories
                               (plotting.py:193-336)
      {prefix}_action.png      2x2 — DNS a-priori SGS contour + log-KDE vs
                               controlled SGS-forcing contour + overlaid KDEs
                               (plotting.py:346-407; needs 'sgs_history')
      {prefix}_action_closeup.png  KDE overlay within +-3 sigma (:410-425)

    dns/base/sgs: dicts with x (N,), tt (T,), uu (T, N), ek_ktt (T, g);
    sgs/base optionally action_fields (T, NA); dns/sgs optionally
    sgs_history (T, N) a-priori/applied SGS terms.  Returns the computed
    panel data (content-tested pixel-independently in tests/test_plotting.py).
    """
    plt = _plt()
    colors = ["black", "royalblue", "seagreen"]
    dns_x, dns_tt, dns_uu = (np.asarray(dns[k]) for k in ("x", "tt", "uu"))
    data = {}

    # ---- 4x4 snapshot grid (plotting.py:165-190) ----
    fig2, axs2 = plt.subplots(4, 4, sharex=True, sharey=True, figsize=(15, 15))
    T_les = len(np.asarray(sgs["tt"]))
    for i in range(16):
        tidx_sgs = min(int(i * T_les / 16), T_les - 1)
        tidx_dns = min(int(i * len(dns_tt) / 16), len(dns_tt) - 1)
        ax = axs2[i // 4, i % 4]
        ax.plot(np.asarray(base["x"]), np.asarray(base["uu"])[tidx_sgs], "-",
                color=colors[1])
        ax.plot(np.asarray(sgs["x"]), np.asarray(sgs["uu"])[tidx_sgs], "-",
                color=colors[2])
        ax.plot(dns_x, dns_uu[tidx_dns], "--", color=colors[0])
    fig2.tight_layout()
    fig2.savefig(f"{file_prefix}_evolution.png")
    plt.close(fig2)

    # ---- 3x6 comparison panel (plotting.py:193-336) ----
    fig1, axs1 = plt.subplots(3, 6, figsize=(24, 12))
    N = dns_uu.shape[1]
    g = np.asarray(sgs["uu"]).shape[1]
    k1 = np.arange(N // 2)
    k2 = np.arange(1, g // 2)
    umax = max(dns_uu.max(), np.asarray(base["uu"]).max(),
               np.asarray(sgs["uu"]).max())
    umin = min(dns_uu.min(), np.asarray(base["uu"]).min(),
               np.asarray(sgs["uu"]).min())
    ulevels = np.linspace(umin, umax + 1e-12, 50)

    # DNS row: field contour + spectra with the k^-2 guide (plotting.py:219-226)
    axs1[0, 0].contourf(dns_x, dns_tt, dns_uu, ulevels)
    axs1[0, 0].set_ylabel("DNS")
    dns_ek = np.asarray(dns["ek_ktt"])
    for sel, style in ((0, ":"), (len(dns_ek) // 2, "--"), (-1, "-")):
        axs1[0, 3].plot(k1[1:], np.abs(dns_ek[sel][1:N // 2]), style,
                        color=colors[0])
    axs1[0, 3].plot(k1[2:-10] if N > 24 else k1[2:],
                    1e-5 * np.asarray(k1[2:-10] if N > 24 else k1[2:],
                                      float) ** (-2.0), "--", linewidth=0.5)
    axs1[0, 3].set_xscale("log")
    axs1[0, 3].set_yscale("log")

    for row, (name, d) in enumerate([("no control", base),
                                     ("controlled", sgs)], start=1):
        x = np.asarray(d["x"])
        tt = np.asarray(d["tt"])
        uu = np.asarray(d["uu"])
        ek = np.asarray(d["ek_ktt"])
        udns = _interp_dns(dns_x, dns_tt, dns_uu, x, tt)
        errU = np.abs(uu - udns)
        mse_t = np.mean(errU**2, axis=1)
        mse_c = np.cumsum(mse_t) / np.arange(1, len(mse_t) + 1)
        tidx = _align_dns_frames(dns_tt, tt)
        dk = dns_ek[tidx][:, 1: g // 2]
        errK_t = np.mean((np.abs(dk - ek[:, 1: g // 2]) / dk) ** 2, axis=1)
        errK_c = np.cumsum(errK_t) / np.arange(1, len(errK_t) + 1)
        data[f"{name}_errU"] = errU
        data[f"{name}_mse_t"] = mse_t
        data[f"{name}_errK_t"] = errK_t
        data[f"{name}_errK_cum"] = errK_c

        axs1[row, 0].contourf(x, tt, uu, ulevels)
        axs1[row, 0].set_ylabel(name)
        axs1[row, 1].contourf(x, tt, errU, 50)
        inst, cum = (errK_t, errK_c) if spectral else (mse_t, mse_c)
        axs1[row, 2].plot(tt, inst, "r:")
        axs1[row, 2].plot(tt, cum, "r-")
        axs1[row, 2].set_yscale("log")
        for sel, style in ((0, ":"), (len(ek) // 2, "--"), (-1, "-")):
            axs1[row, 3].plot(k2, np.abs(ek[sel][1:g // 2]), style,
                              color=colors[row])
        axs1[row, 3].set_xscale("log")
        axs1[row, 3].set_yscale("log")
        for sel, style in ((0, "r:"), (len(ek) // 2, "r--"), (-1, "r-")):
            rel = np.abs((dns_ek[tidx[sel]][1:g // 2] - ek[sel][1:g // 2])
                         / dns_ek[tidx[sel]][1:g // 2])
            axs1[row, 4].plot(k2, rel, style)
        axs1[row, 4].set_xscale("log")
        axs1[row, 4].set_yscale("log")
        if "action_fields" in d:
            a = np.asarray(d["action_fields"])
            acolors = plt.cm.coolwarm(np.linspace(0, 1, a.shape[1]))
            for i in range(a.shape[1]):
                axs1[row, 5].plot(tt, a[:, i], color=acolors[i])
    fig1.tight_layout()
    fig1.savefig(f"{file_prefix}.png")
    plt.close(fig1)

    # ---- 2x2 SGS-term distribution (plotting.py:346-407) ----
    if "sgs_history" in dns and "sgs_history" in sgs:
        from scipy.stats import gaussian_kde
        dns_sgs_full = np.asarray(dns["sgs_history"])
        xi = (np.arange(N) % max(N // g, 1)) == 0
        dns_sgs = dns_sgs_full[:, xi]
        sgs_hist = np.asarray(sgs["sgs_history"])
        smin = min(dns_sgs.min(), sgs_hist.min())
        smax = max(dns_sgs.max(), sgs_hist.max())
        svals = np.linspace(smin, smax, 500)
        dns_kde = gaussian_kde(dns_sgs.ravel())(svals)
        sgs_kde = gaussian_kde(sgs_hist.ravel())(svals)
        data["sgs_kde_grid"] = svals
        data["dns_sgs_kde"] = dns_kde
        data["sgs_sgs_kde"] = sgs_kde

        fig3, axs3 = plt.subplots(2, 2, figsize=(10, 10))
        axs3[0, 0].contourf(np.arange(dns_sgs.shape[1]), dns_tt[:len(dns_sgs)],
                            dns_sgs)
        axs3[0, 1].plot(svals, dns_kde, color=colors[0])
        axs3[0, 1].set_yscale("log")
        axs3[1, 0].contourf(np.asarray(sgs["x"]),
                            np.asarray(sgs["tt"])[:len(sgs_hist)], sgs_hist)
        axs3[1, 1].plot(svals, dns_kde, color=colors[0], linestyle="--")
        axs3[1, 1].plot(svals, sgs_kde, color=colors[2])
        fig3.tight_layout()
        fig3.savefig(f"{file_prefix}_action.png")
        plt.close(fig3)

        # closeup within +-3 sigma of the controlled forcing (plotting.py:410-425)
        mu_, sd = sgs_hist.mean(), sgs_hist.std()
        svals2 = np.linspace(mu_ - 3 * sd, mu_ + 3 * sd, 500)
        fig4, ax4 = plt.subplots(figsize=(10, 10))
        ax4.plot(svals2, gaussian_kde(dns_sgs.ravel())(svals2),
                 color=colors[0], linestyle="--")
        ax4.plot(svals2, gaussian_kde(sgs_hist.ravel())(svals2),
                 color=colors[2])
        ax4.set_yscale("log")
        fig4.tight_layout()
        fig4.savefig(f"{file_prefix}_action_closeup.png")
        plt.close(fig4)
    return data


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
