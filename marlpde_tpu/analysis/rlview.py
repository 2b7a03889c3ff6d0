"""Training-curve viewer CLI: the korali.rlview equivalent
(runs/burger_launcher.sh:72 `python3 -m korali.rlview --dir ... --out ...`).

Usage: python -m marlpde_tpu.analysis.rlview --dir _result_burger_0 [--out curves.png]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="marlpde_tpu.analysis.rlview")
    p.add_argument("--dir", required=True, nargs="+",
                   help="result folder(s) containing history.json")
    p.add_argument("--out", default=None, help="output PNG (default: show stats)")
    args = p.parse_args(argv)

    from marlpde_tpu.analysis import plotting

    histories = []
    for d in args.dir:
        h = os.path.join(d, "history.json")
        if not os.path.exists(h):
            print(f"[rlview] no history.json in {d}", file=sys.stderr)
            continue
        with open(h) as f:
            histories.append((d, json.load(f)))

    if not histories:
        raise SystemExit("[rlview] nothing to plot")

    if args.out:
        if len(histories) == 1:
            plotting.plot_training_curves(histories[0][1], args.out)
        else:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots()
            for d, h in histories:
                ax.plot(h["experiences"], h["mean_return"], label=d)
            ax.set_xlabel("experiences")
            ax.set_ylabel("mean return")
            ax.legend()
            fig.savefig(args.out)
        print(f"[rlview] wrote {args.out}")
    else:
        for d, h in histories:
            print(json.dumps(dict(
                dir=d, generations=h["gen"][-1],
                experiences=h["experiences"][-1],
                last_return=h["mean_return"][-1],
                best_return=max(h["mean_return"]))))


if __name__ == "__main__":
    main()
