"""Fused-path exactness guard: runtime drop-mass/capacity audits and the
evaluator auto-widen policy (replaces the reference CUDA kernel's
unconditional-exactness contract,
`multi_scale_deformable_attn_function.py:15-124`, for our windowed kernel)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bevformer_tpu.configs import get_config
from bevformer_tpu.models import BEVFormer

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow


def _toy_cfg(**kw):
    cfg = get_config("bevformer_tiny")
    base = dict(
        encoder_layers=1, decoder_layers=1, backbone_depth=10,
        fused_msda="fp32", sca_capacity_ratio=0.4,
        # tiny geometry: the 15-row level-0 grid mixes anchor scales 1..8
        # within a sorted tile, so the y-heads need halo 11 where the
        # production default (measured at base geometry) is 9 — SCA item
        # density is data-dependent, the guard (exercised below) is the
        # universal mechanism, and this override pins "clean defaults for
        # the geometry under test"
        sca_fused_halo=(3, 11, 11, 11, 3, 11, 11, 11),
    )
    base.update(kw)
    return dataclasses.replace(cfg, **base)


def _toy_batch(cfg, rng):
    from bevformer_tpu.data.synth import _camera_rigs
    from bevformer_tpu.data.dataset import lidar2img_from_cam_info

    bs, cams = 1, 6
    h, w = cfg.data.img_size
    rigs = _camera_rigs(w, h)
    l2i = np.stack([
        lidar2img_from_cam_info(dict(
            sensor2lidar_rotation=r["rotation"],
            sensor2lidar_translation=r["translation"],
            cam_intrinsic=r["intrinsic"],
        )) for r in rigs.values()
    ])
    return (
        jnp.array(rng.randn(bs, cams, h, w, 3), jnp.float32),
        jnp.zeros((bs, 18), jnp.float32),
        jnp.asarray(np.tile(l2i[None], (bs, 1, 1, 1)), jnp.float32),
        jnp.zeros((bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims), jnp.float32),
        jnp.zeros((bs,), bool),
    )


def _init(model, batch):
    return jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "grid_mask": jax.random.PRNGKey(2)}, *batch
    )


def _poison_tsa_offsets(params, rows):
    """Spread the encoder TSA sampling-offset bias far beyond the halo.

    The per-tile windows follow the sampled rows (placed from each tile's
    min/max), so a UNIFORM shift cannot cause drop — alternate the sign
    per (x, y) pair so the y-offsets of one query's points spread
    +-`rows` BEV cells within a single kernel tile."""
    p = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    import flax

    flat = flax.traverse_util.flatten_dict(p)
    hits = 0
    for k in list(flat):
        if ("self_attn" in k and "sampling_offsets" in k
                and k[-1] == "bias"):
            b = np.asarray(flat[k], np.float32).copy()
            n2 = b.shape[-1] // 2
            pairs = b.reshape(*b.shape[:-1], n2, 2)
            sign = np.where(np.arange(n2) % 2 == 0, 1.0, -1.0)
            pairs[..., 1] += rows * sign  # y components only
            flat[k] = jnp.asarray(pairs.reshape(b.shape))
            hits += 1
    assert hits, "no TSA offset bias found"
    return flax.traverse_util.unflatten_dict(flat)


def test_audit_reports_drop_and_guard_restores_exactness():
    """Adversarial offsets >> halo: the in-graph audit must report the lost
    mass, and the evaluator guard must widen halos until the fused forward
    matches the exact (fused-off) forward."""
    from bevformer_tpu.runtime.eval import VideoEvaluator

    cfg = _toy_cfg()
    rng = np.random.RandomState(0)
    model = BEVFormer(cfg=cfg)
    batch = _toy_batch(cfg, rng)
    params = _init(model, batch)
    # TSA halo default is 6 BEV rows; shift every offset by 12
    params = _poison_tsa_offsets(params, 12.0)

    ev = VideoEvaluator(model, params, fused_guard=True)
    rec0 = ev.audit_frame(*batch[:3])
    assert rec0["drop_frac"] > 1e-3, rec0

    ev._guard_frame(*batch[:3])
    rec = ev.audit_log[-1]
    assert rec["drop_frac"] <= 1e-6, rec
    def _hmax(h):
        return max(h) if isinstance(h, (tuple, list)) else h

    assert ev.cfg.tsa_fused_halo and _hmax(ev.cfg.tsa_fused_halo) > 6

    # the widened fused forward now matches the exact XLA path
    exact_model = BEVFormer(cfg=dataclasses.replace(cfg, fused_msda="off"))
    out_exact = exact_model.apply(params, *batch)
    out_fused = ev.model.apply(params, *batch)
    a = np.asarray(out_exact["all_bbox_preds"])
    b = np.asarray(out_fused["all_bbox_preds"])
    assert np.abs(a - b).max() < 2e-3, np.abs(a - b).max()


def test_midrun_audit_acts_not_logs():
    """Exactness loss appearing at frame 7 (not frame 0) must trigger the
    auto-widen (guard on) or raise (guard off) — a scrolled-by warning is
    not an exactness guarantee. Drift is simulated by swapping in params
    whose TSA offsets exceed the halo after 6 clean frames, mirroring a
    checkpoint whose offsets drifted during training."""
    from bevformer_tpu.runtime.eval import VideoEvaluator

    cfg = _toy_cfg()
    rng = np.random.RandomState(0)
    model = BEVFormer(cfg=cfg)
    batch = _toy_batch(cfg, rng)
    params = _init(model, batch)
    poisoned = _poison_tsa_offsets(params, 12.0)

    def frame(i):
        return dict(
            images=np.asarray(batch[0][0]),
            can_bus=np.zeros(18),
            lidar2img=np.asarray(batch[2][0]),
            scene_token="s0",
            token=f"t{i}",
        )

    ev = VideoEvaluator(model, params, audit_interval=7, fused_guard=True)
    for i in range(7):
        ev.infer_frame(frame(i))
    assert all(r["drop_frac"] <= 1e-6 for r in ev.audit_log), ev.audit_log
    # the drift happens mid-run: frame 7's periodic audit must catch it
    ev.params = poisoned
    ev._build()
    def _hmax(h):
        return max(h) if isinstance(h, (tuple, list)) else h

    halo_before = ev.cfg.tsa_fused_halo
    ev.infer_frame(frame(7))
    assert ev.cfg.tsa_fused_halo and _hmax(ev.cfg.tsa_fused_halo) > (
        _hmax(halo_before) if halo_before else 6)
    assert ev.audit_log[-1]["drop_frac"] <= 1e-6, ev.audit_log[-1]

    # without the guard the same event must raise, not warn
    ev2 = VideoEvaluator(model, params, audit_interval=7, fused_guard=False)
    for i in range(7):
        ev2.infer_frame(frame(i))
    ev2.params = poisoned
    ev2._build()
    with pytest.raises(RuntimeError, match="fused-audit"):
        ev2.infer_frame(frame(7))


def test_capacity_clip_audited():
    """Capacity too small for the visible count: the audit must count the
    clipped queries (the reference never drops visible queries,
    `spatial_cross_attention.py:136-172`)."""
    cfg = _toy_cfg(sca_capacity_ratio=0.06, fused_audit=True)
    rng = np.random.RandomState(1)
    model = BEVFormer(cfg=cfg)
    batch = _toy_batch(cfg, rng)
    params = _init(model, batch)
    _, mut = model.apply(params, *batch, mutable=["intermediates"])
    flat = jax.tree_util.tree_flatten_with_path(mut["intermediates"])[0]
    vals = {
        str(p[-2].key): np.asarray(v).sum()
        for p, v in flat
    }
    assert vals["sca_capacity_clipped"] > 0, vals
    # and at the shipped ratio nothing is clipped
    cfg2 = _toy_cfg(fused_audit=True)
    model2 = BEVFormer(cfg=cfg2)
    _, mut2 = model2.apply(
        _init(model2, batch), *batch, mutable=["intermediates"]
    )
    flat2 = jax.tree_util.tree_flatten_with_path(mut2["intermediates"])[0]
    vals2 = {str(p[-2].key): np.asarray(v).sum() for p, v in flat2}
    assert vals2["sca_capacity_clipped"] == 0, vals2


def test_capacity_ratio_covers_base_geometry():
    """The shipped sca_capacity_ratio must dominate the per-camera visible
    fraction at FULL base geometry (synthetic rig and the real nuScenes
    focal lengths incl. the 110-deg CAM_BACK) — otherwise SCA silently
    drops visible queries."""
    from bevformer_tpu.core import geometry
    from bevformer_tpu.data.synth import _camera_rigs
    from bevformer_tpu.data.dataset import lidar2img_from_cam_info

    cfg = get_config("bevformer_base")
    h_img, w_img = cfg.data.img_size
    rigs = _camera_rigs(w_img, h_img)
    # overwrite with real nuScenes focal lengths (worst case: CAM_BACK 809)
    reals = {"CAM_FRONT": 1266.0, "CAM_FRONT_RIGHT": 1260.0,
             "CAM_FRONT_LEFT": 1272.0, "CAM_BACK": 809.2,
             "CAM_BACK_LEFT": 1256.7, "CAM_BACK_RIGHT": 1259.5}
    for name, f in reals.items():
        intr = rigs[name]["intrinsic"].copy()
        intr[0, 0] = f * (w_img / 1600.0)
        intr[1, 1] = f * (w_img / 1600.0)
        rigs[name]["intrinsic"] = intr
    l2i = jnp.asarray(np.stack([
        lidar2img_from_cam_info(dict(
            sensor2lidar_rotation=r["rotation"],
            sensor2lidar_translation=r["translation"],
            cam_intrinsic=r["intrinsic"],
        )) for r in rigs.values()
    ])[None], jnp.float32)
    ref_3d = geometry.reference_points_3d(
        cfg.bev_h, cfg.bev_w, cfg.pc_range[5] - cfg.pc_range[2],
        cfg.num_points_in_pillar, bs=1,
    )
    _, bev_mask = geometry.point_sampling(
        ref_3d, cfg.pc_range, l2i, (h_img, w_img)
    )
    vis = np.asarray(jnp.any(bev_mask, axis=-1)).sum(axis=-1)  # [1, cams]
    q = cfg.bev_h * cfg.bev_w
    cap = min((int(q * cfg.sca_capacity_ratio) + 127) // 128 * 128, q)
    assert vis.max() <= cap, (
        f"visible {vis.max()} exceeds capacity {cap} "
        f"(ratio {cfg.sca_capacity_ratio})"
    )
