#!/usr/bin/env python
"""Parameter count — mirrors `tools/analysis_tools/get_params.py`.

  python tools/analysis_tools/get_params.py bevformer_base
  python tools/analysis_tools/get_params.py --pth ckpt.pth
"""

import argparse
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--pth", default=None)
    args = p.parse_args()

    if args.pth:
        from bevformer_tpu.runtime.checkpoint import load_pth

        sd = load_pth(args.pth)
        total = sum(v.size for v in sd.values())
    else:
        import jax

        from bevformer_tpu.configs import get_config
        from bevformer_tpu.models import BEVFormer
        from __graft_entry__ import _example_inputs

        cfg = get_config(args.config)
        model = BEVFormer(cfg=cfg)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), *_example_inputs(cfg))
        )
        total = sum(x.size for x in jax.tree.leaves(shapes))
    print(f"{total / 1e6:.2f}M parameters")


if __name__ == "__main__":
    main()
