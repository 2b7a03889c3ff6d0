"""Flagship late-decay analysis from the --diag histories (round-5 item 2).

Reads _result_burger-marl_{914,915,916}/history.json (914 = the 912 config
with per-generation diagnostics; 915 = the gamma=0.995 contraction A/B;
916 = the off-policy-budget D=0.05 A/B), writes
results/flagship_r5/decay_diag.json with the correlation evidence and a
4-panel diagnostic figure (deterministic test return, value bias, policy-mean
scale/drift, reward scale) in the rlview style.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load(run):
    path = f"_result_burger-marl_{run}/history.json"
    if not os.path.exists(path):
        return None
    h = json.load(open(path))
    if not h.get("diag"):
        return None
    d = h["diag"]
    return dict(
        run=run,
        gens=np.arange(1, len(d) + 1),
        tests=np.array(h["test_return"]),
        v0=np.array([x["v0_scaled"] for x in d]),
        ret=np.array([x["return_scaled"] for x in d]),
        drift=np.array([x["mu_drift_rms"] for x in d]),
        mu_rms=np.array([x["mu_rms"] for x in d]),
        sigma=np.array([x["sigma_probe"] for x in d]),
        rscale=np.array([x["rew_scale"] for x in d]))


def stats(r):
    bias = r["v0"] - r["ret"]
    # blowup generations make return_scaled +-inf; exclude them from the
    # correlation/extreme statistics (keep the trace for the plot)
    bias = np.where(np.isfinite(bias), bias, np.nan)
    t = r["tests"]
    peak = int(t.argmax())
    post = slice(peak, len(t))
    b10 = bias[9::10][: len(t)]
    dr10 = r["drift"][9::10][: len(t)]
    mu10 = r["mu_rms"][9::10][: len(t)]
    out = dict(
        peak_gen=(peak + 1) * 10, peak_test=float(t[peak]),
        final_test=float(t[-1]),
        final_over_peak=float(t[-1] / t[peak]),
        corr_test_negabsbias_postpeak=float(np.corrcoef(
            t[post][np.isfinite(b10[post])],
            -np.abs(b10[post][np.isfinite(b10[post])]))[0, 1]),
        corr_test_negdrift_postpeak=float(
            np.corrcoef(t[post], -dr10[post])[0, 1]),
        corr_test_negmurms_postpeak=float(
            np.corrcoef(t[post], -mu10[post])[0, 1]),
        mu_rms_at_peak=float(mu10[peak]), mu_rms_final=float(mu10[-1]),
        bias_absmax=float(np.nanmax(np.abs(bias))))
    return out, bias


def main():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = [r for r in (load(914), load(915), load(916), load(917)) if r is not None]
    assert runs, "no --diag histories found"
    os.makedirs("results/flagship_r5", exist_ok=True)

    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    summary = {}
    for r in runs:
        s, bias = stats(r)
        summary[str(r["run"])] = s
        lbl = {914: "914 (912 cfg, gamma=1.0)", 915: "915 (gamma=0.995)",
               916: "916 (off-policy D=0.05)",
               917: "917 (trust=forward KL)"}[r["run"]]
        tg = np.arange(1, len(r["tests"]) + 1) * 10
        axes[0, 0].plot(tg, r["tests"], label=lbl)
        axes[0, 1].plot(r["gens"], bias, label=lbl)
        axes[1, 0].plot(r["gens"], r["mu_rms"], label=lbl)
        axes[1, 1].plot(r["gens"], r["drift"], label=lbl)
    axes[0, 0].set_title("deterministic test return (peak-holding)")
    axes[0, 0].set_xlabel("generation")
    axes[0, 1].set_title("value bias  V(s0) - realized return  [scaled]")
    axes[0, 1].set_xlabel("generation")
    axes[1, 0].set_title("policy mean scale ||mu||_rms (probe states)")
    axes[1, 0].set_xlabel("generation")
    axes[1, 1].set_title("per-generation policy drift ||dmu||_rms")
    axes[1, 1].set_xlabel("generation")
    for ax in axes.ravel():
        ax.grid(alpha=0.3)
        ax.legend(fontsize=8)
    fig.tight_layout()
    fig.savefig("results/flagship_r5/decay_diag.png", dpi=130)
    with open("results/flagship_r5/decay_diag.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
