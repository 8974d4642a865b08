#!/usr/bin/env python
"""Browse dataset samples — mirrors `tools/misc/browse_dataset.py`.

Renders the 6 camera images with projected GT boxes plus a BEV plot per
sample, for visually validating data pipelines and geometry.

  python tools/misc/browse_dataset.py bevformer_tiny --data-root DATA \
      --out-dir browse [--split train] [--max-samples 3]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--data-root", required=True)
    p.add_argument("--split", default="train", choices=["train", "val"])
    p.add_argument("--out-dir", default="browse")
    p.add_argument("--max-samples", type=int, default=3)
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from bevformer_tpu.configs import get_config
    from bevformer_tpu.core.boxes import CLASS_NAMES
    from bevformer_tpu.data.dataset import CAM_ORDER, NuScenesTemporalDataset

    cfg = get_config(args.config)
    ds = NuScenesTemporalDataset(
        os.path.join(
            args.data_root, f"nuscenes_infos_temporal_{args.split}.pkl"
        ),
        cfg,
        data_root=args.data_root,
        test_mode=(args.split == "val"),
    )
    os.makedirs(args.out_dir, exist_ok=True)

    mean = np.asarray(cfg.data.mean)
    std = np.asarray(cfg.data.std)
    for i in range(min(args.max_samples, len(ds))):
        s = ds.get_test_sample(i)
        rec = ds.frame_record(i)
        ann = ds._annotations(ds.infos[i]) if "gt_boxes" in ds.infos[i] else None
        fig, axes = plt.subplots(2, 4, figsize=(22, 9))
        for ci in range(min(6, s["images"].shape[0])):
            ax = axes[ci // 3][ci % 3]
            img = s["images"][ci] * std + mean
            if cfg.data.to_rgb:
                ax.imshow(np.clip(img, 0, 255).astype(np.uint8))
            else:
                ax.imshow(np.clip(img[..., ::-1], 0, 255).astype(np.uint8))
            ax.set_title(CAM_ORDER[ci] if ci < len(CAM_ORDER) else f"cam{ci}")
            ax.axis("off")
            if ann is not None:
                for b in ann["gt_boxes"]:
                    pt = s["lidar2img"][ci] @ np.array([b[0], b[1], b[2], 1.0])
                    if pt[2] > 0.5:
                        u, v = pt[0] / pt[2], pt[1] / pt[2]
                        hgt, wdt = cfg.data.img_size
                        if 0 <= u < wdt and 0 <= v < hgt:
                            ax.plot(u, v, "r+", markersize=12)
        axb = axes[0][3]
        if ann is not None:
            axb.scatter(ann["gt_boxes"][:, 0], ann["gt_boxes"][:, 1], s=12)
        axb.plot(0, 0, "r^")
        axb.set_xlim(-55, 55)
        axb.set_ylim(-55, 55)
        axb.set_title("BEV GT")
        axb.grid(alpha=0.3)
        axes[1][3].axis("off")
        out = os.path.join(args.out_dir, f"sample_{i:04d}.png")
        fig.savefig(out, dpi=90, bbox_inches="tight")
        plt.close(fig)
        print(out)


if __name__ == "__main__":
    main()
