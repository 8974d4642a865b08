#!/usr/bin/env python
"""Strip optimizer state from a checkpoint for publishing — mirrors
`tools/model_converters/publish_model.py`.

  python tools/model_converters/publish_model.py IN_CKPT_DIR OUT_DIR
  python tools/model_converters/publish_model.py IN_CKPT_DIR out.pth --pth CONFIG
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt", help="orbax checkpoint dir")
    p.add_argument("out", help="output dir (orbax) or .pth file")
    p.add_argument("--pth", default=None, help="config name for .pth export")
    args = p.parse_args()

    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(args.in_ckpt)) as mgr:
        step = mgr.latest_step()
        restored = mgr.restore(step)
    params = restored["params"]
    print(f"loaded step {step}")

    if args.pth:
        import torch

        from bevformer_tpu.configs import get_config
        from bevformer_tpu.runtime.checkpoint import export_reference_state_dict

        cfg = get_config(args.pth)
        sd = export_reference_state_dict(params, cfg)
        torch.save(
            {"state_dict": {k: torch.from_numpy(v.copy()) for k, v in sd.items()}},
            args.out,
        )
        print(f"wrote reference-format {args.out} ({len(sd)} tensors)")
    else:
        with ocp.CheckpointManager(os.path.abspath(args.out)) as out_mgr:
            out_mgr.save(step, args=ocp.args.StandardSave({"params": params}))
            out_mgr.wait_until_finished()
        print(f"wrote params-only checkpoint to {args.out}")


if __name__ == "__main__":
    main()
