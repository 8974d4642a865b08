"""Fold conv+BN pairs in a saved checkpoint (reference:
`/root/reference/tools/misc/fuse_conv_bn.py`).

Loads an orbax checkpoint, applies `runtime/fuse.py::fuse_conv_bn`, and
saves the fused variables to a new directory. Eval outputs are identical
up to float rounding; the batch_stats collection degenerates to identity
constants (see runtime/fuse.py docstring for why this is a portability
feature, not a TPU speed feature).

Usage: python tools/misc/fuse_conv_bn.py <ckpt_dir> <out_dir>
"""

import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    src, dst = sys.argv[1], sys.argv[2]
    import jax

    jax.config.update("jax_platforms", "cpu")
    import orbax.checkpoint as ocp

    from bevformer_tpu.runtime.fuse import fuse_conv_bn

    with ocp.CheckpointManager(os.path.abspath(src)) as mgr:
        step = mgr.latest_step()
        restored = mgr.restore(step)
    fused = dict(restored)
    fused["params"] = fuse_conv_bn(restored["params"])
    with ocp.CheckpointManager(os.path.abspath(dst)) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(fused))
        mgr.wait_until_finished()
    print(f"fused checkpoint written to {dst} (step {step})")


if __name__ == "__main__":
    main()
