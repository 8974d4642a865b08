#!/usr/bin/env python
"""Data preparation CLI — mirrors the reference `tools/create_data.py`.

Two modes:
  * `nuscenes` — build `nuscenes_infos_temporal_{train,val}.pkl` from a raw
    nuScenes + CAN-bus download (requires nuscenes-devkit; schema matches
    `tools/data_converter/nuscenes_converter.py:154-233`).
  * `synth` — generate a self-consistent synthetic mini dataset in the same
    format (no external data needed; used for smoke tests and CI).

  python tools/create_data.py synth --out-dir data/synth --scenes 4
  python tools/create_data.py nuscenes --root-path data/nuscenes \
      --canbus data/nuscenes --version v1.0-trainval
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="mode", required=True)

    ps = sub.add_parser("synth")
    ps.add_argument("--out-dir", required=True)
    ps.add_argument("--scenes", type=int, default=2)
    ps.add_argument("--frames", type=int, default=8)
    ps.add_argument("--objects", type=int, default=12)
    ps.add_argument("--img-w", type=int, default=1600)
    ps.add_argument("--img-h", type=int, default=900)
    ps.add_argument("--seed", type=int, default=0)

    pn = sub.add_parser("nuscenes")
    pn.add_argument("--root-path", required=True)
    pn.add_argument("--canbus", required=True)
    pn.add_argument("--version", default="v1.0-trainval")
    pn.add_argument("--out-dir", default=None)

    args = p.parse_args()

    if args.mode == "synth":
        from bevformer_tpu.data.synth import generate

        out = generate(
            args.out_dir,
            num_scenes=args.scenes,
            frames_per_scene=args.frames,
            num_objects=args.objects,
            img_w=args.img_w,
            img_h=args.img_h,
            seed=args.seed,
        )
        print(f"synthetic dataset written to {out}")
    else:
        from bevformer_tpu.data.nuscenes_converter import create_nuscenes_infos

        create_nuscenes_infos(
            args.root_path,
            args.canbus,
            out_dir=args.out_dir or args.root_path,
            version=args.version,
        )


if __name__ == "__main__":
    main()
