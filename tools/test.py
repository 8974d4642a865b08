#!/usr/bin/env python
"""Evaluation CLI — mirrors the reference `tools/test.py`.

Runs sequential video inference over the val split, evaluates NDS/mAP with
the built-in nuScenes-protocol evaluator, and (optionally) writes the
standard nuScenes submission JSON for official devkit evaluation.

  python tools/test.py <config-name> --data-root DATA
      [--checkpoint CKPT(.pth|orbax dir)] [--out results.json] [--eval bbox]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate BEVFormer-TPU")
    p.add_argument("config")
    p.add_argument("--data-root", required=True)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default=None, help="write raw results json")
    p.add_argument("--eval", default="bbox", help="'bbox' or 'none'")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument(
        "--format-only", action="store_true",
        help="only write the nuScenes submission json",
    )
    p.add_argument(
        "--overlap-test", action="store_true",
        help="evaluate only boxes in camera-overlap regions "
        "(NuScenesEval_custom overlap_test mode)",
    )
    p.add_argument(
        "--parity", action="store_true",
        help="bit-parity mode: disable every fused/approximate path "
        "(fused_msda/fused_dcn off, exact XLA sampling) for checkpoint "
        "parity runs; slower but unconditionally exact",
    )
    p.add_argument(
        "--audit-interval", type=int, default=100,
        help="run the fused-path exactness audits (window drop mass, SCA "
        "capacity clipping) on the first frame and every N frames; 0 "
        "disables",
    )
    p.add_argument(
        "--no-fused-guard", action="store_true",
        help="do not auto-widen fused halos/capacity when the first-frame "
        "audit reports lost attention mass",
    )
    p.add_argument(
        "--fuse-conv-bn", action="store_true",
        help="fold BatchNorm into the preceding conv kernels before eval "
        "(reference tools/misc/fuse_conv_bn.py); exact up to float rounding",
    )
    p.add_argument("--cfg-options", nargs="*", default=[])
    return p.parse_args()


def _build_v2(args, cfg):
    """BEVFormerV2 eval path: frames-keyed history, per-sample re-encode
    (`detectors/bevformerV2.py:226-266` — forward_test/simple_test)."""
    import jax
    import jax.numpy as jnp

    from bevformer_tpu.data.dataset_v2 import NuScenesTemporalDatasetV2
    from bevformer_tpu.models.detector_v2 import BEVFormerV2
    from bevformer_tpu.runtime import checkpoint as ckpt_lib
    from bevformer_tpu.runtime.eval import VideoEvaluatorV2

    ds = NuScenesTemporalDatasetV2(
        os.path.join(args.data_root, "nuscenes_infos_temporal_val.pkl"),
        cfg,
        test_mode=True,
        data_root=args.data_root,
    )
    print(f"val dataset: {len(ds)} samples (v2, frames={cfg.frames})")

    model = BEVFormerV2(cfg=cfg)
    if args.checkpoint and args.checkpoint.endswith(".pth"):
        variables = ckpt_lib.convert_pth_checkpoint_v2(args.checkpoint, cfg)
        print(f"loaded reference weights {args.checkpoint}")
    elif args.checkpoint:
        import orbax.checkpoint as ocp

        with ocp.CheckpointManager(os.path.abspath(args.checkpoint)) as mgr:
            step = mgr.latest_step()
            restored = mgr.restore(step)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats"):
            variables["batch_stats"] = restored["batch_stats"]
        print(f"loaded orbax checkpoint step {step}")
    else:
        print("WARNING: random weights (no --checkpoint)")
        s = ds.get_test_sample_v2(0)
        cur = list(cfg.frames).index(0)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.asarray(s["images"][cur], jnp.float32)[None],
            jnp.asarray(s["lidar2img"][cur], jnp.float32)[None],
        )
    if args.fuse_conv_bn:
        from bevformer_tpu.runtime.fuse import fuse_conv_bn

        variables = dict(variables, params=fuse_conv_bn(variables["params"]))
        print("fused conv+BN (eval-time fold)")
    return ds, VideoEvaluatorV2(model, variables)


def main():
    args = parse_args()
    # multi-host bring-up MUST precede any backend use
    from bevformer_tpu.runtime.distributed import (
        allgather_results,
        maybe_initialize,
    )

    maybe_initialize()
    import jax
    import numpy as np
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bevformer_tpu.configs import get_config
    from bevformer_tpu.configs.config import apply_overrides
    from bevformer_tpu.core.boxes import CLASS_NAMES
    from bevformer_tpu.core.evaluation import evaluate_detections
    from bevformer_tpu.data.dataset import NuScenesTemporalDataset
    from bevformer_tpu.models import BEVFormer
    from bevformer_tpu.runtime import checkpoint as ckpt_lib
    from bevformer_tpu.runtime.eval import VideoEvaluator

    cfg = get_config(args.config)
    if args.cfg_options:
        cfg = apply_overrides(
            cfg, dict(kv.split("=", 1) for kv in args.cfg_options)
        )
    if args.parity:
        import dataclasses

        cfg = dataclasses.replace(cfg, fused_msda="off", fused_dcn="off")
        print("parity mode: fused kernels off (exact XLA sampling paths)")

    if cfg.version == "v2":
        ds, evaluator = _build_v2(args, cfg)
    else:
        ds = NuScenesTemporalDataset(
            os.path.join(args.data_root, "nuscenes_infos_temporal_val.pkl"),
            cfg,
            test_mode=True,
            data_root=args.data_root,
        )
        print(f"val dataset: {len(ds)} samples")

        model = BEVFormer(cfg=cfg)
        if args.checkpoint and args.checkpoint.endswith(".pth"):
            params = ckpt_lib.convert_pth_checkpoint(args.checkpoint, cfg)
            print(f"loaded reference weights {args.checkpoint}")
        elif args.checkpoint:
            import orbax.checkpoint as ocp

            with ocp.CheckpointManager(os.path.abspath(args.checkpoint)) as mgr:
                step = mgr.latest_step()
                restored = mgr.restore(step)
            params = restored["params"]
            print(f"loaded orbax checkpoint step {step}")
        else:
            print("WARNING: random weights (no --checkpoint)")
            s = ds.get_test_sample(0)
            import jax.numpy as jnp

            params = jax.jit(model.init)(
                jax.random.PRNGKey(0),
                jnp.asarray(s["images"])[None],
                jnp.zeros((1, 18), jnp.float32),
                jnp.asarray(s["lidar2img"])[None],
                jnp.zeros(
                    (1, cfg.bev_h * cfg.bev_w, cfg.embed_dims), jnp.float32
                ),
                jnp.zeros((1,), bool),
            )

        if args.fuse_conv_bn:
            from bevformer_tpu.runtime.fuse import fuse_conv_bn

            params = fuse_conv_bn(params)
            print("fused conv+BN (eval-time fold)")

        from bevformer_tpu.kernels.msda_pallas import resolve_impl

        fused_on = resolve_impl(cfg.fused_msda) != "off"
        evaluator = VideoEvaluator(
            model, params,
            audit_interval=args.audit_interval if fused_on else 0,
            fused_guard=fused_on and not args.no_fused_guard,
        )
    n = len(ds) if args.max_samples is None else min(len(ds), args.max_samples)
    # Multi-process: contiguous per-rank video segments (the reference's
    # eval DistributedSampler, `samplers/distributed_sampler.py:22-41`) so
    # temporal state never crosses a rank boundary; results are re-merged
    # in rank order == global order. (V2 eval has no cross-sample state so
    # any split works; contiguous keeps it uniform.)
    rank, nproc = jax.process_index(), jax.process_count()
    per = -(-n // nproc)
    lo, hi = rank * per, min((rank + 1) * per, n)
    results = evaluator.run(ds, indices=range(lo, hi))
    if nproc > 1:
        packed = [
            np.concatenate(
                [
                    np.asarray(r["boxes_3d"], np.float32).reshape(-1, 9),
                    np.asarray(r["scores_3d"], np.float32).reshape(-1, 1),
                    np.asarray(r["labels_3d"], np.float32).reshape(-1, 1),
                ],
                axis=1,
            )
            for r in results
        ]
        gathered = allgather_results(packed, width=11)
        assert len(gathered) == n, (len(gathered), n)
        results = [
            dict(
                token=ds.infos[i]["token"],
                boxes_3d=a[:, :9],
                scores_3d=a[:, 9],
                labels_3d=a[:, 10].astype(np.int64),
            )
            for i, a in enumerate(gathered)
        ]
        if rank != 0:
            return
    if getattr(evaluator, "audit_log", None):
        import json as _json

        worst = max(r["drop_frac"] for r in evaluator.audit_log)
        clipped = max(r["capacity_clipped"] for r in evaluator.audit_log)
        print(
            "fused-path audit: frames="
            f"{len(evaluator.audit_log)} worst_drop_frac={worst:.3e} "
            f"max_capacity_clipped={clipped}"
        )
        if args.out:
            with open(
                os.path.splitext(args.out)[0] + "_fused_audit.json", "w"
            ) as f:
                _json.dump(evaluator.audit_log, f, indent=1)

    if args.out:
        serial = [
            {
                "token": r["token"],
                "boxes_3d": np.asarray(r["boxes_3d"]).tolist(),
                "scores_3d": np.asarray(r["scores_3d"]).tolist(),
                "labels_3d": np.asarray(r["labels_3d"]).tolist(),
            }
            for r in results
        ]
        with open(args.out, "w") as f:
            json.dump(serial, f)
        print(f"wrote {args.out}")

    if args.format_only or args.out:
        # standard nuScenes submission JSON (format_results parity):
        # global-frame boxes + the class/velocity default attribute_name
        from bevformer_tpu.core.evaluation import format_submission

        info_by_token = {ds.infos[i]["token"]: ds.infos[i] for i in range(n)}
        sub = format_submission(results, info_by_token)
        sub_path = (
            os.path.splitext(args.out)[0] + "_nusc.json"
            if args.out
            else "results_nusc.json"
        )
        with open(sub_path, "w") as f:
            json.dump(sub, f)
        print(f"wrote nuScenes submission {sub_path}")
        if args.format_only:
            return

    if args.eval == "bbox":
        # build GT lookup from infos
        gt_by_token = {}
        for i in range(n):
            info = ds.infos[i]
            ann = ds._annotations(info)
            boxes = ann["gt_boxes"].copy()
            if len(boxes):
                boxes[:, 2] -= 0.5 * boxes[:, 5]  # gravity -> bottom z
            gt_by_token[info["token"]] = dict(
                boxes=boxes, labels=ann["gt_labels"],
                attrs=ann.get("gt_attrs"),
            )
        if args.overlap_test:
            from bevformer_tpu.core.evaluation import apply_overlap_filter

            l2i_by_token = {
                ds.infos[i]["token"]: ds.frame_record(i)["lidar2img"]
                for i in range(n)
            }
            results, gt_by_token = apply_overlap_filter(
                results, gt_by_token, l2i_by_token, cfg.data.raw_size
            )
        metrics = evaluate_detections(
            results, gt_by_token, class_names=CLASS_NAMES, verbose=True
        )
        summary = {
            "NDS": metrics["nd_score"],
            "mAP": metrics["mean_ap"],
            **{
                k: v
                for k, v in metrics["tp_errors"].items()
            },
        }
        print(json.dumps(summary))
        out_dir = os.path.dirname(args.out) if args.out else "."
        with open(os.path.join(out_dir, "metrics_summary.json"), "w") as f:
            json.dump(metrics, f, default=float)


if __name__ == "__main__":
    main()
