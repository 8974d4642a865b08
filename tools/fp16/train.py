#!/usr/bin/env python
"""Mixed-precision training entry — mirrors `tools/fp16/train.py`.

On TPU the fp16 loss-scaling machinery (frozen eval model + TransferWeight
hook, `runner/epoch_based_runner.py`) is unnecessary: bf16 has fp32-range
exponents and the temporal history already runs under stop_gradient with
the live parameters. This shim forces dtype=bfloat16 and delegates to the
standard trainer.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

def force_bf16_argv(argv):
    """Return argv with `dtype=bfloat16` attached to `--cfg-options`.

    When the flag is already present, the override is inserted directly
    AFTER it so argparse's nargs="*" associates it (appending at the end of
    argv would leave it dangling or error out).
    """
    argv = list(argv)
    if "--cfg-options" in argv:
        argv.insert(argv.index("--cfg-options") + 1, "dtype=bfloat16")
    else:
        argv.extend(["--cfg-options", "dtype=bfloat16"])
    return argv


if __name__ == "__main__":
    sys.argv = force_bf16_argv(sys.argv)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "train_main",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "train.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
