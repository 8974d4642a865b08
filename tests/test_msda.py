"""msda vs torch.grid_sample oracle.

The oracle reimplements the semantics of mmcv's pure-PyTorch fallback
(bilinear grid_sample per level, align_corners=False, zeros padding,
attention-weighted sum) directly with torch.nn.functional.grid_sample, which
is the reference's CPU execution path and therefore the ground truth.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from bevformer_tpu.kernels import ms_deform_attn_jnp

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow


def torch_oracle(value, spatial_shapes, locations, weights):
    """value [B,K,H,D], locations [B,Q,H,L,P,2], weights [B,Q,H,L,P]."""
    b, k, h, d = value.shape
    _, q, _, l, p, _ = locations.shape
    value = torch.from_numpy(value)
    locations = torch.from_numpy(locations)
    weights = torch.from_numpy(weights)

    value_list = value.split([hh * ww for hh, ww in spatial_shapes], dim=1)
    sampling_grids = 2 * locations - 1
    sampling_value_list = []
    for lvl, (hh, ww) in enumerate(spatial_shapes):
        # [B, hw, H, D] -> [B*H, D, hh, ww]
        v = (
            value_list[lvl]
            .flatten(2)
            .transpose(1, 2)
            .reshape(b * h, d, hh, ww)
        )
        g = sampling_grids[:, :, :, lvl].transpose(1, 2).flatten(0, 1)
        sampled = F.grid_sample(
            v, g, mode="bilinear", padding_mode="zeros", align_corners=False
        )
        sampling_value_list.append(sampled)
    attn = weights.transpose(1, 2).reshape(b * h, 1, q, l * p)
    out = (
        (torch.stack(sampling_value_list, dim=-2).flatten(-2) * attn)
        .sum(-1)
        .view(b, h * d, q)
    )
    return out.transpose(1, 2).contiguous().numpy()


@pytest.mark.parametrize(
    "shapes,heads,points",
    [
        (((15, 25),), 8, 8),
        (((16, 22), (8, 11)), 8, 4),
        (((29, 50), (15, 25), (8, 13), (4, 7)), 8, 8),
    ],
)
def test_msda_matches_grid_sample(shapes, heads, points):
    rng = np.random.RandomState(0)
    b, q, d = 2, 37, 32
    k = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.randn(b, k, heads, d).astype(np.float32)
    # cover in-bounds, edge, and out-of-bounds locations
    loc = rng.uniform(-0.2, 1.2, size=(b, q, heads, l, points, 2)).astype(
        np.float32
    )
    w = rng.rand(b, q, heads, l, points).astype(np.float32)
    w /= w.reshape(b, q, heads, -1).sum(-1).reshape(b, q, heads, 1, 1)

    expected = torch_oracle(value, shapes, loc, w)
    got = np.asarray(
        ms_deform_attn_jnp(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "shapes,heads,points",
    [
        (((15, 25),), 8, 8),
        (((29, 50), (15, 25), (8, 13), (4, 7)), 8, 8),
    ],
)
def test_patch_gather_matches_reference(shapes, heads, points):
    from bevformer_tpu.kernels.msda import ms_deform_attn_patch

    rng = np.random.RandomState(7)
    b, q, d = 2, 53, 32
    k = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.randn(b, k, heads, d).astype(np.float32)
    loc = rng.uniform(-0.5, 1.5, size=(b, q, heads, l, points, 2)).astype(
        np.float32
    )
    w = rng.rand(b, q, heads, l, points).astype(np.float32)
    a = np.asarray(
        ms_deform_attn_jnp(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    )
    c = np.asarray(
        ms_deform_attn_patch(
            jnp.array(value), shapes, jnp.array(loc), jnp.array(w)
        )
    )
    np.testing.assert_allclose(c, a, rtol=1e-5, atol=1e-5)


def test_msda_grad_finite():
    import jax

    shapes = ((8, 12),)
    b, q, h, d, p = 1, 9, 2, 8, 4
    k = sum(hh * ww for hh, ww in shapes)
    rng = np.random.RandomState(1)
    value = jnp.array(rng.randn(b, k, h, d), jnp.float32)
    loc = jnp.array(rng.uniform(0, 1, (b, q, h, 1, p, 2)), jnp.float32)
    w = jax.nn.softmax(jnp.array(rng.randn(b, q, h, 1, p), jnp.float32))

    def f(v, l2, w2):
        return ms_deform_attn_jnp(v, shapes, l2, w2).sum()

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(value, loc, w)
    for g in (gv, gl, gw):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(gv).sum()) > 0
    assert float(jnp.abs(gl).sum()) > 0


@pytest.mark.parametrize(
    "shapes,heads,points,band_rows",
    [
        (((15, 25),), 8, 8, 4),
        (((16, 22), (8, 11)), 4, 4, 4),
        (((29, 50), (15, 25), (8, 13), (4, 7)), 8, 8, 5),
    ],
)
def test_banded_matches_reference(shapes, heads, points, band_rows):
    """Round-2 banded MXU prototype: exact when capacity is not exceeded.

    Uniform random locations with a generous capacity_ratio guarantee no
    band overflow, so the result must match the oracle bit-for-bit-ish.
    """
    from bevformer_tpu.kernels.msda import ms_deform_attn_banded

    rng = np.random.RandomState(3)
    b, q, d = 2, 41, 32
    k = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.randn(b, k, heads, d).astype(np.float32)
    loc = rng.uniform(-0.3, 1.3, size=(b, q, heads, l, points, 2)).astype(
        np.float32
    )
    w = rng.rand(b, q, heads, l, points).astype(np.float32)

    a = np.asarray(
        ms_deform_attn_jnp(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    )
    c = np.asarray(
        ms_deform_attn_banded(
            jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
            band_rows=band_rows, capacity_ratio=6.0,
        )
    )
    np.testing.assert_allclose(c, a, rtol=1e-4, atol=1e-5)


def _coherent_locations(rng, b, q, heads, shapes, points, jitter_rows=2.0):
    """Sampling locations whose item order (q-major, p-minor per head) is
    row-coherent: normalized y grows slowly with query index, with jitter
    bounded in IMAGE ROWS of every level (so each 256-item tile fits a
    stride+halo window at all levels)."""
    l = len(shapes)
    base = (np.arange(q) + 0.5) / q  # [0, 1)
    y = np.empty((b, q, heads, l, points), np.float32)
    for lvl, (hh, ww) in enumerate(shapes):
        jit = rng.uniform(-jitter_rows, jitter_rows, size=(b, q, heads, points))
        y[:, :, :, lvl, :] = base[None, :, None, None] + jit / hh
    x = rng.uniform(-0.2, 1.2, size=(b, q, heads, l, points)).astype(np.float32)
    return np.stack([x, y], axis=-1).astype(np.float32)


@pytest.mark.parametrize(
    "shapes,heads,points",
    [
        (((30, 25),), 8, 8),
        (((32, 22), (16, 11)), 4, 4),
        (((29, 50), (15, 25), (8, 13), (4, 7)), 8, 8),
    ],
)
def test_windowed_pallas_matches_reference(shapes, heads, points):
    """Fused Pallas kernel (interpret mode on CPU) vs the XLA oracle for
    row-coherent item orders, incl. out-of-image sampling locations."""
    from bevformer_tpu.kernels import msda_pallas as mp

    rng = np.random.RandomState(7)
    b, q, d = 2, 256, 32
    k = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.randn(b, k, heads, d).astype(np.float32)
    loc = _coherent_locations(rng, b, q, heads, shapes, points)
    w = rng.rand(b, q, heads, l, points).astype(np.float32)

    drops = mp.window_drop_mass(
        shapes, jnp.array(loc), jnp.array(w), stride=4, halo=8, cap_tile=128
    )
    assert drops == [0.0] * l, drops
    a = np.asarray(
        ms_deform_attn_jnp(jnp.array(value), shapes, jnp.array(loc), jnp.array(w))
    )
    c = np.asarray(
        mp._forward(
            jnp.array(value), shapes, jnp.array(loc), jnp.array(w),
            stride=4, halo=8, cap_tile=128, interpret=True,
        )
    )
    np.testing.assert_allclose(c, a, rtol=1e-4, atol=1e-5)


def test_windowed_pallas_precomputed_and_bf16():
    """prepare_window_values must equal inline prep; bf16 compute stays
    within bf16 tolerance; non-multiple-of-tile item counts pad safely."""
    from bevformer_tpu.kernels import msda_pallas as mp

    rng = np.random.RandomState(11)
    shapes = ((12, 18),)
    b, q, heads, points, d = 1, 61, 4, 4, 32  # q*p = 244, not tile multiple
    k = sum(h * w for h, w in shapes)
    value = jnp.array(rng.randn(b, k, heads, d), jnp.float32)
    loc = jnp.array(_coherent_locations(rng, b, q, heads, shapes, points))
    w = jnp.array(rng.rand(b, q, heads, 1, points), jnp.float32)

    ref = np.asarray(ms_deform_attn_jnp(value, shapes, loc, w))
    wins = mp.prepare_window_values(value, shapes, stride=4, halo=8)
    out = np.asarray(
        mp._forward(value, shapes, loc, w, wins,
                    stride=4, halo=8, cap_tile=128, interpret=True)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    out16 = np.asarray(
        mp._forward(value, shapes, loc, w,
                    stride=4, halo=8, cap_tile=128,
                    compute_dtype=jnp.bfloat16, interpret=True)
    )
    assert np.max(np.abs(out16 - ref)) / np.max(np.abs(ref)) < 0.02


def test_windowed_pallas_incoherent_drops_are_bounded_and_audited():
    """A y-incoherent order must only LOSE attention mass (never corrupt):
    the audit reports the loss and the output stays finite with per-query
    error bounded by the dropped weight."""
    import jax

    from bevformer_tpu.kernels import msda_pallas as mp

    rng = np.random.RandomState(13)
    shapes = ((64, 12),)
    b, q, heads, points, d = 1, 64, 2, 4, 32
    k = sum(h * w for h, w in shapes)
    value = jnp.array(rng.randn(b, k, heads, d), jnp.float32)
    loc = jnp.array(rng.rand(b, q, heads, 1, points, 2), jnp.float32)
    w = jnp.array(rng.rand(b, q, heads, 1, points), jnp.float32)

    drops = mp.window_drop_mass(shapes, loc, w, stride=4, halo=4,
                                cap_tile=128)
    assert drops[0] > 0
    out = np.asarray(
        mp._forward(value, shapes, loc, w, stride=4, halo=4, cap_tile=128,
                    interpret=True)
    )
    assert np.isfinite(out).all()


def test_windowed_pallas_backward_consistent_incoherent_order():
    """With a y-INCOHERENT item order the kernel may drop mass, but its
    gradient must stay consistent with whatever function it computes.
    Before round 3 a revisited window index (j=5,6,5 style sequences)
    OVERWROTE the previously accumulated dValue block in the backward
    (_tile_windows now emits a cummax-monotone sequence shared by forward,
    backward and the drop audit). Verified by a directional finite
    difference of the fused forward itself."""
    import jax

    from bevformer_tpu.kernels import msda_pallas as mp

    rng = np.random.RandomState(3)
    shapes = ((64, 12),)
    b, q, heads, points, d = 1, 96, 2, 4, 16
    k = sum(h * w for h, w in shapes)
    value = jnp.array(rng.randn(b, k, heads, d), jnp.float32)
    # alternate row bands per 32-query block so consecutive tiles map to
    # windows ...j, j', j... (non-monotone before the cummax fix)
    base = np.where((np.arange(q) // 32) % 2 == 0, 0.3, 0.7)
    y = base[None, :, None, None, None] + rng.uniform(
        -0.05, 0.05, size=(b, q, heads, 1, points)
    )
    x = rng.uniform(0, 1, size=(b, q, heads, 1, points))
    loc = jnp.array(np.stack([x, y], -1), jnp.float32)
    w = jnp.array(rng.rand(b, q, heads, 1, points), jnp.float32)
    cot = jnp.array(rng.randn(b, q, heads * d), jnp.float32)

    def f(v):
        out = mp.ms_deform_attn_pallas(
            v, shapes, loc, w, stride=4, halo=6, cap_tile=64,
        )
        return (out * cot).sum()

    gv = jax.grad(f)(value)
    dv = jnp.array(rng.randn(*value.shape), jnp.float32)
    eps = 1e-3
    fd = (f(value + eps * dv) - f(value - eps * dv)) / (2 * eps)
    an = jnp.vdot(gv, dv)
    assert abs(float(fd) - float(an)) < 1e-2 * max(abs(float(fd)), 1.0), (
        float(fd), float(an)
    )


def test_tsa_fused_matches_off():
    """TemporalSelfAttention with the fused kernel (interpret mode on CPU)
    must match the XLA path: BEV grid order is row-coherent and init
    offsets stay within the halo."""
    import jax
    from bevformer_tpu.models.attention import TemporalSelfAttention

    rng = np.random.RandomState(21)
    # bev_w wide enough that a 256-item tile spans ~1 BEV row (as in the
    # real 200-wide grids); narrow grids would need a larger fused_halo
    bs, bev_h, bev_w, e = 1, 12, 128, 64
    q = bev_h * bev_w
    query = jnp.array(rng.randn(bs, q, e) * 0.1, jnp.float32)
    vq = jnp.array(rng.randn(bs, 2, q, e) * 0.1, jnp.float32)
    pos = jnp.array(rng.randn(bs, q, e) * 0.1, jnp.float32)
    # real TSA contract: grid-aligned 2D reference points (+ small shift
    # on the prev slot), not arbitrary locations
    from bevformer_tpu.core import geometry
    ref2d = geometry.reference_points_2d(bev_h, bev_w, bs=bs)  # [bs,q,1,2]
    shift = jnp.array([[0.01, -0.008]], jnp.float32)
    ref = jnp.stack([ref2d + shift[:, None, None], ref2d], axis=1)

    kw = dict(embed_dims=e, num_heads=4, num_points=4)
    m_off = TemporalSelfAttention(fused_msda="off", **kw)
    params = m_off.init(jax.random.PRNGKey(0), query, vq, pos, ref,
                        bev_h, bev_w)
    a = m_off.apply(params, query, vq, pos, ref, bev_h, bev_w)
    m_on = TemporalSelfAttention(fused_msda="fp32", **kw)
    b = m_on.apply(params, query, vq, pos, ref, bev_h, bev_w)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-5)


def test_sca_inner_fused_matches_off():
    """MSDeformableAttention3D fused path (anchor-sorted items) vs the XLA
    path at multi-level shapes."""
    import jax
    from bevformer_tpu.models.attention import MSDeformableAttention3D

    rng = np.random.RandomState(22)
    b, q, e, nz = 1, 2000, 64, 4
    shapes = ((40, 25), (20, 13), (10, 7), (5, 4))
    k = sum(h * w for h, w in shapes)
    query = jnp.array(rng.randn(b, q, e) * 0.1, jnp.float32)
    value = jnp.array(rng.randn(b, k, e) * 0.1, jnp.float32)
    ref = jnp.array(rng.rand(b, q, nz, 2), jnp.float32)

    kw = dict(embed_dims=e, num_heads=4, num_levels=len(shapes),
              num_points=8)
    m_off = MSDeformableAttention3D(fused_msda="off", **kw)
    params = m_off.init(jax.random.PRNGKey(1), query, value, ref, shapes)
    a = m_off.apply(params, query, value, ref, shapes)
    # production default halos are tuned for the 116-row base geometry and
    # drop a little mass at this 40-row toy level (the documented window
    # approximation, runtime-guarded by the drop-mass audit); pin the test
    # at halos that cover the toy geometry and assert zero drop
    from bevformer_tpu.configs.config import FusedSpec

    spec = FusedSpec(msda="fp32", audit=True, sca_halo=15)
    m_on = MSDeformableAttention3D(fused_msda=spec, **kw)
    b_, inter = m_on.apply(
        params, query, value, ref, shapes, mutable=["intermediates"]
    )
    drop = np.asarray(
        inter["intermediates"]["msda_drop_mass"][0]
    )
    assert drop.sum() == 0.0, drop
    np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                               rtol=1e-4, atol=1e-5)


def test_sca_inner_fused_bf16_close():
    """bf16 fused mode (bf16 offset/weight permute + bitcast-riding f32
    anchors + bf16 MXU) stays close to the exact XLA path."""
    import jax
    from bevformer_tpu.models.attention import MSDeformableAttention3D

    rng = np.random.RandomState(23)
    b, q, e, nz = 1, 2000, 64, 4
    shapes = ((40, 25), (20, 13), (10, 7), (5, 4))
    k = sum(h * w for h, w in shapes)
    query = jnp.array(rng.randn(b, q, e) * 0.1, jnp.float32)
    value = jnp.array(rng.randn(b, k, e) * 0.1, jnp.float32)
    ref = jnp.array(rng.rand(b, q, nz, 2), jnp.float32)

    kw = dict(embed_dims=e, num_heads=4, num_levels=len(shapes),
              num_points=8)
    m_off = MSDeformableAttention3D(fused_msda="off", **kw)
    params = m_off.init(jax.random.PRNGKey(1), query, value, ref, shapes)
    a = np.asarray(m_off.apply(params, query, value, ref, shapes))
    # toy-geometry halo override, same rationale as matches_off above
    from bevformer_tpu.configs.config import FusedSpec

    m_on = MSDeformableAttention3D(
        fused_msda=FusedSpec(msda="bf16", audit=False, sca_halo=15), **kw
    )
    b_ = np.asarray(
        m_on.apply(params, query, value, ref, shapes), np.float32
    )
    # bf16 matmuls + bf16 offset rounding: expect ~1% of the output scale
    scale = np.abs(a).max()
    assert np.abs(b_ - a).max() < 0.03 * scale
    assert np.abs(b_ - a).mean() < 0.003 * scale


@pytest.mark.parametrize(
    "shapes,heads,points",
    [
        (((30, 25),), 8, 8),
        (((29, 50), (15, 25), (8, 13), (4, 7)), 8, 8),
    ],
)
def test_windowed_pallas_backward_matches_oracle(shapes, heads, points):
    """The scatter-free Pallas backward (dValue window accumulation +
    modified-payload dAttw/dLoc passes) vs autodiff of the XLA oracle."""
    import jax

    from bevformer_tpu.kernels import msda_pallas as mp

    rng = np.random.RandomState(13)
    b, q, d = 1, 256, 32
    k = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = jnp.array(rng.randn(b, k, heads, d), jnp.float32)
    loc = jnp.array(_coherent_locations(rng, b, q, heads, shapes, points))
    w = jnp.array(rng.rand(b, q, heads, l, points), jnp.float32)
    cot = jnp.array(rng.randn(b, q, heads * d), jnp.float32)

    def loss_oracle(v, lo, ww_):
        return (ms_deform_attn_jnp(v, shapes, lo, ww_) * cot).sum()

    def loss_pallas(v, lo, ww_):
        out = mp.ms_deform_attn_pallas(
            v, shapes, lo, ww_, stride=4, halo=8, cap_tile=128,
        )
        return (out * cot).sum()

    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(value, loc, w)
    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(value, loc, w)
    for name, a, b_ in zip(("value", "loc", "attw"), go, gp):
        a, b_ = np.asarray(a), np.asarray(b_)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(b_ - a).max() < 2e-4 * scale, (
            name, np.abs(b_ - a).max(), scale
        )


def test_sca_routing_fns_match_scatter_formulation():
    """route_gather/route_scatter (gathers both directions) vs the naive
    indexing/scatter-add formulations, values AND gradients."""
    import jax

    from bevformer_tpu.models.attention import (
        route_gather, route_scatter, routing_inverse,
    )

    rng = np.random.RandomState(5)
    bs, cams, q, cap, e = 2, 3, 40, 16, 8
    x = jnp.array(rng.randn(bs, q, e), jnp.float32)
    attn = jnp.array(rng.randn(bs, cams, cap, e), jnp.float32)
    # unique indices per (b, c)
    top_idx = jnp.array(
        np.stack([
            np.stack([rng.permutation(q)[:cap] for _ in range(cams)])
            for _ in range(bs)
        ]), jnp.int32)
    inv, found = routing_inverse(top_idx, q)
    cot_g = jnp.array(rng.randn(bs, cams, cap, e), jnp.float32)
    cot_s = jnp.array(rng.randn(bs, q, e), jnp.float32)

    def sel_ref(xx):
        return jax.vmap(
            jax.vmap(lambda a, i: a[i], in_axes=(None, 0)), in_axes=(0, 0)
        )(xx, top_idx)

    def scat_ref(aa):
        def one(idx, val):
            return jnp.zeros((q, e)).at[idx.reshape(-1)].add(
                val.reshape(-1, e))
        return jax.vmap(one)(top_idx, aa)

    np.testing.assert_allclose(
        np.asarray(route_gather(x, top_idx, inv, found)),
        np.asarray(sel_ref(x)), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(route_scatter(attn, top_idx, inv, found)),
        np.asarray(scat_ref(attn)), atol=1e-6)

    g_new = jax.grad(lambda xx: (route_gather(xx, top_idx, inv, found)
                                 * cot_g).sum())(x)
    g_ref = jax.grad(lambda xx: (sel_ref(xx) * cot_g).sum())(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-5)
    s_new = jax.grad(lambda aa: (route_scatter(aa, top_idx, inv, found)
                                 * cot_s).sum())(attn)
    s_ref = jax.grad(lambda aa: (scat_ref(aa) * cot_s).sum())(attn)
    np.testing.assert_allclose(np.asarray(s_new), np.asarray(s_ref),
                               atol=1e-5)


def test_routing_inverse_vis_matches_general():
    """The cumsum fast path assumes the stable visible-first top-k order
    `sca_capacity_precompute` produces; pin it against the general
    sort+searchsorted construction across visibility regimes (n_vis<cap,
    >cap, 0, all)."""
    import jax

    from bevformer_tpu.models.attention import (
        routing_inverse, routing_inverse_vis,
    )

    rng = np.random.RandomState(7)
    bs, cams, q, cap = 2, 3, 64, 16
    masks = [
        rng.rand(bs, cams, q) < 0.15,  # mostly n_vis < cap
        rng.rand(bs, cams, q) < 0.6,   # n_vis > cap
        np.zeros((bs, cams, q), bool),
        np.ones((bs, cams, q), bool),
    ]
    for mk in masks:
        anyz = jnp.asarray(mk)
        vis = anyz.astype(jnp.float32)
        _, top_idx = jax.lax.top_k(
            vis - jnp.arange(q, dtype=jnp.float32)[None, None] * 1e-9, cap
        )
        inv_g, found_g = routing_inverse(top_idx, q)
        inv_v, found_v = routing_inverse_vis(anyz, cap)
        np.testing.assert_array_equal(np.asarray(found_g),
                                      np.asarray(found_v))
        np.testing.assert_array_equal(np.asarray(inv_g), np.asarray(inv_v))


def test_capacity_precompute_sort_outputs():
    """The variadic-sort formulation of sort_perm/sort_inv/ref_sorted must
    match the argsort+gather formulation it replaced."""
    from bevformer_tpu.models.attention import sca_capacity_precompute

    rng = np.random.RandomState(9)
    bs, cams, q, nz = 1, 3, 64, 4
    ref = jnp.array(rng.rand(bs, cams, q, nz, 2), jnp.float32)
    mask = jnp.array(rng.rand(bs, cams, q, nz) < 0.4)
    out = sca_capacity_precompute(ref, mask, 0.25, with_sort=True)
    cap = out["top_idx"].shape[-1]
    refq = np.asarray(out["ref_sel"]).reshape(bs * cams, cap * nz, 2)
    key = refq[..., 1]
    perm_ref = np.argsort(key, axis=1, kind="stable")
    np.testing.assert_array_equal(np.asarray(out["sort_perm"]), perm_ref)
    np.testing.assert_array_equal(
        np.asarray(out["sort_inv"]),
        np.argsort(perm_ref, axis=1, kind="stable"),
    )
    np.testing.assert_allclose(
        np.asarray(out["ref_sorted"]),
        np.take_along_axis(refq, perm_ref[:, :, None], axis=1),
        atol=0,
    )


def test_decoder_cross_attn_fused_matches_off():
    """CustomMSDeformableAttention fused path (sorted queries) vs XLA."""
    import jax

    from bevformer_tpu.models.attention import CustomMSDeformableAttention

    rng = np.random.RandomState(31)
    bs, q, e = 2, 120, 64
    shapes = ((40, 25),)
    k = shapes[0][0] * shapes[0][1]
    query = jnp.array(rng.randn(bs, q, e) * 0.1, jnp.float32)
    value = jnp.array(rng.randn(bs, k, e) * 0.1, jnp.float32)
    qpos = jnp.array(rng.randn(bs, q, e) * 0.1, jnp.float32)
    ref = jnp.array(rng.rand(bs, q, 1, 2), jnp.float32)

    kw = dict(embed_dims=e, num_heads=4, num_points=4)
    m_off = CustomMSDeformableAttention(fused_msda="off", **kw)
    params = m_off.init(jax.random.PRNGKey(0), query, value, qpos, ref,
                        shapes)
    a = m_off.apply(params, query, value, qpos, ref, shapes)
    m_on = CustomMSDeformableAttention(fused_msda="fp32", **kw)
    b = m_on.apply(params, query, value, qpos, ref, shapes)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=1e-4, atol=1e-5)
