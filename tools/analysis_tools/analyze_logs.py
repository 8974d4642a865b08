#!/usr/bin/env python
"""Training-log analysis — mirrors `tools/analysis_tools/analyze_logs.py`.

Operates on the train_log.jsonl written by tools/train.py.

  python tools/analysis_tools/analyze_logs.py cal_train_time LOG.jsonl
  python tools/analysis_tools/analyze_logs.py plot_curve LOG.jsonl \
      --keys total loss_cls --out curves.png
"""

import argparse
import json


def load_log(path):
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def cal_train_time(entries):
    if len(entries) < 2:
        print("not enough entries")
        return
    spans = [
        (b["time"] - a["time"]) / max(b["step"] - a["step"], 1)
        for a, b in zip(entries[:-1], entries[1:])
    ]
    import numpy as np

    arr = np.array(spans)
    print(
        f"slowest iter: {arr.max():.3f}s, fastest: {arr.min():.3f}s, "
        f"mean: {arr.mean():.3f}s/iter"
    )


def plot_curve(entries, keys, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps = [e["step"] for e in entries]
    for k in keys:
        plt.plot(steps, [e.get(k, float("nan")) for e in entries], label=k)
    plt.xlabel("iter")
    plt.legend()
    plt.grid(alpha=0.3)
    plt.savefig(out, dpi=120)
    print(f"wrote {out}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["cal_train_time", "plot_curve"])
    p.add_argument("log")
    p.add_argument("--keys", nargs="*", default=["total"])
    p.add_argument("--out", default="curves.png")
    args = p.parse_args()
    entries = load_log(args.log)
    if args.task == "cal_train_time":
        cal_train_time(entries)
    else:
        plot_curve(entries, args.keys, args.out)


if __name__ == "__main__":
    main()
