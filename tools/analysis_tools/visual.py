#!/usr/bin/env python
"""Prediction visualization — mirrors `tools/analysis_tools/visual.py`.

Renders predictions (and optionally GT) from a results json produced by
tools/test.py: BEV top-down plot + per-camera projected boxes.

  python tools/analysis_tools/visual.py results.json --data-root DATA \
      --out-dir viz [--config bevformer_tiny] [--gt] [--max-samples 5]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def corners_bev(box):
    cx, cy, w, l, yaw = box[0], box[1], box[3], box[4], box[6]
    c, s = np.cos(yaw), np.sin(yaw)
    pts = np.array(
        [[w / 2, l / 2], [w / 2, -l / 2], [-w / 2, -l / 2], [-w / 2, l / 2]]
    )
    rot = np.array([[c, -s], [s, c]])
    return pts @ rot.T + [cx, cy]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("results")
    p.add_argument("--data-root", required=True)
    p.add_argument("--config", default="bevformer_tiny")
    p.add_argument("--out-dir", default="viz")
    p.add_argument("--score-thr", type=float, default=0.3)
    p.add_argument("--max-samples", type=int, default=5)
    p.add_argument("--gt", action="store_true")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from bevformer_tpu.configs import get_config
    from bevformer_tpu.core.boxes import CLASS_NAMES
    from bevformer_tpu.data.dataset import NuScenesTemporalDataset

    cfg = get_config(args.config)
    ds = NuScenesTemporalDataset(
        os.path.join(args.data_root, "nuscenes_infos_temporal_val.pkl"),
        cfg,
        test_mode=True,
        data_root=args.data_root,
        load_images=False,
    )
    token_to_idx = {info["token"]: i for i, info in enumerate(ds.infos)}

    with open(args.results) as f:
        results = json.load(f)

    os.makedirs(args.out_dir, exist_ok=True)
    cmap = plt.get_cmap("tab10")
    for r in results[: args.max_samples]:
        idx = token_to_idx.get(r["token"])
        if idx is None:
            continue
        fig, ax = plt.subplots(figsize=(8, 8))
        boxes = np.asarray(r["boxes_3d"], np.float64).reshape(-1, 9)
        scores = np.asarray(r["scores_3d"])
        labels = np.asarray(r["labels_3d"], int)
        keep = scores >= args.score_thr
        for b, l in zip(boxes[keep], labels[keep]):
            poly = corners_bev(b)
            ax.add_patch(
                plt.Polygon(poly, fill=False, color=cmap(l % 10), lw=1.5)
            )
        if args.gt:
            ann = ds._annotations(ds.infos[idx])
            for b, l in zip(ann["gt_boxes"], ann["gt_labels"]):
                ax.add_patch(
                    plt.Polygon(
                        corners_bev(b), fill=False, color="k", lw=1.0,
                        linestyle="--",
                    )
                )
        ax.plot(0, 0, "r^", markersize=10)
        ax.set_xlim(-55, 55)
        ax.set_ylim(-55, 55)
        ax.set_aspect("equal")
        ax.grid(alpha=0.3)
        ax.set_title(r["token"])
        out = os.path.join(args.out_dir, f"{r['token']}_bev.png")
        fig.savefig(out, dpi=110, bbox_inches="tight")
        plt.close(fig)
        print(out)


if __name__ == "__main__":
    main()
