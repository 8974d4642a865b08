#!/usr/bin/env python
"""Print a resolved config — mirrors `tools/misc/print_config.py`."""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="*", default=[])
    args = p.parse_args()

    from bevformer_tpu.configs import get_config
    from bevformer_tpu.configs.config import apply_overrides

    cfg = get_config(args.config)
    if args.cfg_options:
        cfg = apply_overrides(cfg, dict(kv.split("=", 1) for kv in args.cfg_options))
    print(json.dumps(dataclasses.asdict(cfg), indent=2, default=str))


if __name__ == "__main__":
    main()
