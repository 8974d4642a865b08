#!/usr/bin/env python
"""Training CLI — mirrors the reference `tools/train.py` surface.

Usage:
  python tools/train.py <config-name> --data-root DATA [--work-dir DIR]
      [--resume-from CKPT] [--max-iters N] [--cfg-options k=v ...]

Config names are the model-zoo presets (bevformer_tiny / small / base /
tiny_fp16). Data root must contain nuscenes_infos_temporal_train.pkl (real
converted nuScenes or `tools/create_data.py synth`).
"""

import argparse
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train BEVFormer-TPU")
    p.add_argument("config", help="config name (e.g. bevformer_tiny)")
    p.add_argument("--data-root", required=True)
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--load-from", default=None, help=".pth or orbax dir warm start")
    p.add_argument("--max-iters", type=int, default=None, help="cap for smoke runs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", type=int, default=None, help="data-parallel size")
    p.add_argument("--sp", type=int, default=1, help="BEV sequence-parallel size")
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--ckpt-interval-epochs", type=int, default=1)
    p.add_argument(
        "--eval-interval-epochs", type=int, default=0,
        help="run val NDS/mAP every N epochs (0 = off); the reference's "
        "CustomDistEvalHook equivalent",
    )
    p.add_argument(
        "--check-grads", action="store_true",
        help="on the first step, list parameters with all-zero gradients "
        "(the reference GradChecker hook)",
    )
    p.add_argument(
        "--fused-audit-interval", type=int, default=500,
        help="every N steps, run the fused-path exactness audit (window "
        "drop mass / SCA capacity clipping) on the current batch's last "
        "frame and log it — catches learned offsets drifting past the "
        "kernel halos during training; 0 disables",
    )
    p.add_argument(
        "--cfg-options", nargs="*", default=[], help="key=val config overrides"
    )
    return p.parse_args()


def main():
    args = parse_args()
    # multi-host bring-up MUST precede any backend use (the reference calls
    # init_dist before model build, `tools/train.py:168-175`)
    from bevformer_tpu.runtime.distributed import maybe_initialize

    maybe_initialize()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import numpy as np

    from bevformer_tpu.configs import get_config
    from bevformer_tpu.configs.config import apply_overrides
    from bevformer_tpu.data.dataset import NuScenesTemporalDataset
    from bevformer_tpu.models import BEVFormer
    from bevformer_tpu.runtime import checkpoint as ckpt_lib
    from bevformer_tpu.runtime import mesh as mesh_lib
    from bevformer_tpu.runtime import optim, train

    cfg = get_config(args.config)
    if args.cfg_options:
        cfg = apply_overrides(
            cfg, dict(kv.split("=", 1) for kv in args.cfg_options)
        )
    work_dir = args.work_dir or os.path.join("work_dirs", args.config)
    os.makedirs(work_dir, exist_ok=True)
    with open(os.path.join(work_dir, "config.json"), "w") as f:
        json.dump({"config": args.config, "overrides": args.cfg_options}, f)

    if cfg.version == "v2":
        return _train_v2(args, cfg, work_dir)

    ds = NuScenesTemporalDataset(
        os.path.join(args.data_root, "nuscenes_infos_temporal_train.pkl"),
        cfg,
        data_root=args.data_root,
        seed=args.seed,
    )
    print(f"dataset: {len(ds)} samples")

    n_dev = len(jax.devices())  # global across processes after dist init
    dp = args.dp or max(1, n_dev // args.sp)
    mesh = mesh_lib.make_mesh(dp=dp, sp=args.sp)
    global_bs = dp * cfg.optim.samples_per_gpu
    # each process hosts its local slice of the batch (shard_batch
    # assembles the global array); the rank-sharded sampler feeds it
    nproc = jax.process_count()
    local_bs = max(1, global_bs // nproc)
    steps_per_epoch = max(1, len(ds) // global_bs)
    total_steps = steps_per_epoch * cfg.optim.total_epochs
    if args.max_iters:
        total_steps = min(total_steps, args.max_iters)
    print(
        f"mesh dp={dp} sp={args.sp}; global batch {global_bs} "
        f"({nproc} proc x {local_bs}); {total_steps} steps"
    )

    model = BEVFormer(cfg=cfg)
    rng = jax.random.PRNGKey(args.seed)

    # epoch-seeded shuffled sampler (the reference's DistributedGroupSampler
    # semantics, `datasets/samplers/group_sampler.py:62-103`); multi-host
    # runs shard via num_replicas/rank
    from bevformer_tpu.data.sampler import GroupShuffleSampler

    sampler = GroupShuffleSampler(
        len(ds),
        num_replicas=jax.process_count(),
        rank=jax.process_index(),
        seed=args.seed,
    )
    sampler_state = {"epoch": -1, "order": [], "pos": 0}

    def next_index(step):
        epoch = step // steps_per_epoch
        if epoch != sampler_state["epoch"]:
            sampler.set_epoch(epoch)
            sampler_state.update(epoch=epoch, order=sampler.indices(), pos=0)
        if sampler_state["pos"] >= len(sampler_state["order"]):
            sampler_state["pos"] = 0
        idx = sampler_state["order"][sampler_state["pos"]]
        sampler_state["pos"] += 1
        return int(idx)

    def collect_batch(step):
        samples = []
        tries = 0
        while len(samples) < local_bs:
            s = ds.get_train_sample(next_index(step))
            tries += 1
            if s is not None:
                samples.append(s)
            if tries > 10 * local_bs + 100:
                raise RuntimeError("dataset yielded no valid samples")
        return train.Batch(
            images=np.stack([s["images"] for s in samples]),
            can_bus=np.stack([s["can_bus"] for s in samples]),
            lidar2img=np.stack([s["lidar2img"] for s in samples]),
            prev_exists=np.stack([s["prev_exists"] for s in samples]),
            gt_boxes=np.stack([s["gt_boxes"] for s in samples]),
            gt_labels=np.stack([s["gt_labels"] for s in samples]),
            num_gt=np.asarray([s["num_gt"] for s in samples], np.int32),
        )

    with mesh_lib.activate(mesh):
        batch0 = mesh_lib.shard_batch(mesh, collect_batch(0))
        state = train.init_state(model, _Placeholder(), rng, batch0)
        if args.load_from and args.load_from.endswith(".pth"):
            converted = ckpt_lib.convert_pth_checkpoint(args.load_from, cfg)
            state = state._replace(
                params={**state.params, "params": converted["params"]}
            )
            print(f"warm-started from {args.load_from}")
        tx, sched = optim.make_optimizer(cfg.optim, state.params, total_steps,
                     bn_trainable=(cfg.backbone_norm == "bn"))
        state = train.TrainState(state.step, state.params, tx.init(state.params))
        if args.resume_from:
            state = ckpt_lib.restore_checkpoint(args.resume_from, state)
            print(f"resumed from step {int(state.step)}")
        step_fn = train.make_train_step(model, tx, check_grads=args.check_grads)

        audit_fn = None
        from bevformer_tpu.kernels.msda_pallas import resolve_impl as _ri

        if args.fused_audit_interval and _ri(cfg.fused_msda) != "off":
            import dataclasses as _dc

            from bevformer_tpu.runtime.eval import collect_fused_audit

            audit_model = BEVFormer(cfg=_dc.replace(cfg, fused_audit=True))

            @jax.jit
            def audit_fn(params, batch):
                # audit the LAST frame's forward with the current weights —
                # catches sampling offsets drifting past the kernel halos
                bs = batch.images.shape[0]
                prev = jnp.zeros(
                    (bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims), jnp.float32
                )
                _, mut = audit_model.apply(
                    params, batch.images[:, -1], batch.can_bus[:, -1],
                    batch.lidar2img[:, -1], prev,
                    jnp.zeros((bs,), bool), mutable=["intermediates"],
                )
                return collect_fused_audit(mut["intermediates"])

        log_path = os.path.join(work_dir, "train_log.jsonl")
        t_start = time.time()
        start_step = int(state.step)
        prefetch = BatchPrefetcher(collect_batch, start_step, total_steps)
        for step in range(start_step, total_steps):
            raw, host_ms, wait_ms = prefetch.get()
            batch = mesh_lib.shard_batch(mesh, raw)
            state, metrics = step_fn(state, batch, jax.random.fold_in(rng, step))
            if audit_fn is not None and step % args.fused_audit_interval == 0:
                drop, tot, clipped = audit_fn(state.params, batch)
                rec = {
                    "fused_audit_step": step,
                    "drop_frac": float(drop) / max(float(tot), 1.0),
                    "capacity_clipped": int(clipped),
                }
                if rec["drop_frac"] > 1e-6 or rec["capacity_clipped"] > 0:
                    print(
                        f"[fused-audit] WARNING: offsets exceed kernel "
                        f"windows: {rec} — raise cfg.sca_fused_halo/"
                        f"tsa_fused_halo or sca_capacity_ratio",
                        flush=True,
                    )
                elif step == start_step:
                    print(json.dumps(rec))
            ppn = metrics.pop("per_param_grad_norm", None)
            if ppn is not None and step == start_step:
                unused = train.unused_param_report(
                    ppn, state.params, cfg.optim.frozen_stages,
                    bn_trainable=(cfg.backbone_norm == "bn"))
                print(json.dumps({"unused_params": unused, "step": step}))
            if step % args.log_interval == 0 or step == total_steps - 1:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(
                    step=step,
                    lr=float(sched(step)),
                    time=round(time.time() - t_start, 1),
                    host_ms=round(host_ms, 1),
                    data_wait_ms=round(wait_ms, 1),
                )
                print(json.dumps({k: round(v, 4) if isinstance(v, float) else v for k, v in m.items()}))
                with open(log_path, "a") as f:
                    f.write(json.dumps(m) + "\n")
            if (step + 1) % (steps_per_epoch * args.ckpt_interval_epochs) == 0 or (
                step + 1
            ) == total_steps:
                ckpt_lib.save_checkpoint(
                    os.path.join(work_dir, "ckpts"), state, step + 1
                )
                print(f"saved checkpoint @ step {step + 1}")
            if args.eval_interval_epochs and (step + 1) % (
                steps_per_epoch * args.eval_interval_epochs
            ) == 0:
                _run_eval(cfg, model, state, args.data_root, work_dir, step + 1)

    print("done")


def _train_v2(args, cfg, work_dir):
    """BEVFormerV2 training path (frames history, BN stats, mono head)."""
    import jax
    import numpy as np

    from bevformer_tpu.data.dataset_v2 import NuScenesTemporalDatasetV2
    from bevformer_tpu.models.detector_v2 import BEVFormerV2
    from bevformer_tpu.runtime import mesh as mesh_lib
    from bevformer_tpu.runtime import optim
    from bevformer_tpu.runtime.train_v2 import (
        BatchV2,
        TrainStateV2,
        init_state_v2,
        make_train_step_v2,
    )

    ds = NuScenesTemporalDatasetV2(
        os.path.join(args.data_root, "nuscenes_infos_temporal_train.pkl"),
        cfg,
        data_root=args.data_root,
        seed=args.seed,
    )
    print(f"dataset: {len(ds)} samples (v2, frames={cfg.frames})")

    n_dev = len(jax.devices())
    dp = args.dp or max(1, n_dev // args.sp)
    mesh = mesh_lib.make_mesh(dp=dp, sp=args.sp)
    global_bs = dp * cfg.optim.samples_per_gpu
    steps_per_epoch = max(1, len(ds) // global_bs)
    total_steps = steps_per_epoch * cfg.optim.total_epochs
    if args.max_iters:
        total_steps = min(total_steps, args.max_iters)
    print(f"mesh dp={dp}; {total_steps} steps")

    model = BEVFormerV2(cfg=cfg)
    rng = jax.random.PRNGKey(args.seed)
    use_mono = cfg.num_mono_levels > 0

    def collect(step):
        samples = []
        while len(samples) < global_bs:
            idx = int(
                jax.random.randint(
                    jax.random.fold_in(rng, step * 1000 + len(samples)),
                    (), 0, len(ds),
                )
            )
            s = ds.get_train_sample_v2(idx)
            if s is not None:
                samples.append(s)

        def stack(key):
            return np.stack([s[key] for s in samples])

        mono_targets = None
        inv_k = None
        if use_mono:
            key_map = {
                "mono_boxes2d": "boxes2d",
                "mono_classes": "classes",
                "mono_num_gt": "num_gt",
                "mono_img_valid": "img_valid",
                "mono_quat": "box3d_quat",
                "mono_ctr": "box3d_ctr",
                "mono_depth": "box3d_depth",
                "mono_size": "box3d_size",
                "mono_attributes": "attributes",
                "mono_speeds": "speeds",
            }
            mono_targets = {
                dst: np.concatenate([s[src] for s in samples])
                for src, dst in key_map.items()
            }
            inv_k = stack("inv_intrinsics")
        return BatchV2(
            images=stack("images"),
            lidar2img=stack("lidar2img"),
            frame_valid=stack("frame_valid"),
            flip=stack("flip"),
            bda_mat=stack("bda_mat"),
            gt_boxes=stack("gt_boxes"),
            gt_labels=stack("gt_labels"),
            num_gt=np.asarray([s["num_gt"] for s in samples], np.int32),
            inv_intrinsics=inv_k,
            mono_targets=mono_targets,
        )

    with mesh_lib.activate(mesh):
        batch0 = collect(0)
        state = init_state_v2(model, _Placeholder(), rng, batch0)
        tx, sched = optim.make_optimizer(cfg.optim, state.params, total_steps,
                     bn_trainable=(cfg.backbone_norm == "bn"))
        state = TrainStateV2(
            state.step, state.params, state.batch_stats, tx.init(state.params)
        )
        from bevformer_tpu.runtime import checkpoint as ckpt_lib

        start_step = 0
        if args.resume_from:
            state = ckpt_lib.restore_checkpoint_v2(args.resume_from, state)
            start_step = int(state.step)
            print(f"resumed from {args.resume_from} @ step {start_step}")
        step_fn = make_train_step_v2(model, tx)
        log_path = os.path.join(work_dir, "train_log.jsonl")
        t_start = time.time()
        for step in range(start_step, total_steps):
            batch = mesh_lib.shard_batch(mesh, collect(step))
            state, metrics = step_fn(state, batch, jax.random.fold_in(rng, step))
            if step % args.log_interval == 0 or step == total_steps - 1:
                m = {k: round(float(v), 4) for k, v in metrics.items()}
                m.update(step=step, time=round(time.time() - t_start, 1))
                print(json.dumps(m))
                with open(log_path, "a") as f:
                    f.write(json.dumps(m) + "\n")
            if (step + 1) % (steps_per_epoch * args.ckpt_interval_epochs) == 0 or (
                step + 1
            ) == total_steps:
                ckpt_lib.save_checkpoint(
                    os.path.join(work_dir, "ckpts"), state, step + 1
                )
                print(f"saved checkpoint @ step {step + 1}")
            if args.eval_interval_epochs and (step + 1) % (
                steps_per_epoch * args.eval_interval_epochs
            ) == 0:
                _run_eval_v2(cfg, model, state, args.data_root, work_dir,
                             step + 1)
    print("done")


def _run_eval_v2(cfg, model, state, data_root, work_dir, step):
    """In-training V2 eval (CustomDistEvalHook equivalent for the
    frames-keyed history path, `bevformerV2.py:226-266`)."""
    import json as _json
    import os as _os

    from bevformer_tpu.core.boxes import CLASS_NAMES
    from bevformer_tpu.core.evaluation import evaluate_detections
    from bevformer_tpu.data.dataset_v2 import NuScenesTemporalDatasetV2
    from bevformer_tpu.runtime.eval import VideoEvaluatorV2

    val_pkl = _os.path.join(data_root, "nuscenes_infos_temporal_val.pkl")
    if not _os.path.exists(val_pkl):
        print("eval skipped: no val pkl")
        return
    ds = NuScenesTemporalDatasetV2(val_pkl, cfg, test_mode=True,
                                   data_root=data_root)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    evaluator = VideoEvaluatorV2(model, variables)
    results = evaluator.run(ds)
    gt = {}
    for i in range(len(ds)):
        ann = ds._annotations(ds.infos[i])
        boxes = ann["gt_boxes"].copy()
        if len(boxes):
            boxes[:, 2] -= 0.5 * boxes[:, 5]
        gt[ds.infos[i]["token"]] = dict(
            boxes=boxes, labels=ann["gt_labels"], attrs=ann.get("gt_attrs")
        )
    m = evaluate_detections(results, gt, class_names=CLASS_NAMES, verbose=True)
    entry = dict(step=step, NDS=m["nd_score"], mAP=m["mean_ap"])
    print(_json.dumps(entry))
    with open(_os.path.join(work_dir, "eval_log.jsonl"), "a") as f:
        f.write(_json.dumps(entry) + "\n")


def _run_eval(cfg, model, state, data_root, work_dir, step):
    """In-training eval (CustomDistEvalHook equivalent)."""
    import json as _json
    import os as _os

    import numpy as _np

    from bevformer_tpu.core.boxes import CLASS_NAMES
    from bevformer_tpu.core.evaluation import evaluate_detections
    from bevformer_tpu.data.dataset import NuScenesTemporalDataset
    from bevformer_tpu.runtime.eval import VideoEvaluator

    val_pkl = _os.path.join(data_root, "nuscenes_infos_temporal_val.pkl")
    if not _os.path.exists(val_pkl):
        print("eval skipped: no val pkl")
        return
    ds = NuScenesTemporalDataset(val_pkl, cfg, test_mode=True, data_root=data_root)
    evaluator = VideoEvaluator(model, state.params)
    results = evaluator.run(ds)
    gt = {}
    for i in range(len(ds)):
        ann = ds._annotations(ds.infos[i])
        boxes = ann["gt_boxes"].copy()
        if len(boxes):
            boxes[:, 2] -= 0.5 * boxes[:, 5]
        gt[ds.infos[i]["token"]] = dict(
            boxes=boxes, labels=ann["gt_labels"], attrs=ann.get("gt_attrs")
        )
    m = evaluate_detections(results, gt, class_names=CLASS_NAMES, verbose=True)
    entry = dict(step=step, NDS=m["nd_score"], mAP=m["mean_ap"])
    print(_json.dumps(entry))
    with open(_os.path.join(work_dir, "eval_log.jsonl"), "a") as f:
        f.write(_json.dumps(entry) + "\n")


class _Placeholder:
    def init(self, params):
        return ()

    def update(self, grads, state, params=None):
        return grads, state


class BatchPrefetcher:
    """Overlap host-side batch assembly (JPEG decode + resize + stacking)
    with device compute — the reference overlaps via dataloader worker
    processes (`datasets/builder.py:83-102`); here ONE daemon thread stays
    `depth` batches ahead (numpy work releases the GIL in the hot parts).

    `get()` returns (batch, host_ms, wait_ms): host_ms = wall time the
    thread spent building the batch, wait_ms = time the trainer blocked
    waiting for it — wait_ms ~ 0 means data loading is fully hidden."""

    def __init__(self, fn, start_step, total_steps, depth=2):
        self._q = queue.Queue(maxsize=depth)
        self._err = None

        def run():
            try:
                for step in range(start_step, total_steps):
                    t0 = time.time()
                    b = fn(step)
                    self._q.put((b, (time.time() - t0) * 1000.0))
            except BaseException as e:  # surface in get()
                self._err = e
                self._q.put((None, 0.0))

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def get(self):
        t0 = time.time()
        b, host_ms = self._q.get()
        if b is None and self._err is not None:
            raise self._err
        return b, host_ms, (time.time() - t0) * 1000.0


if __name__ == "__main__":
    main()
