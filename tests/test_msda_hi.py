"""Heads-inner (v3) fused kernel vs the XLA oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bevformer_tpu.kernels import ms_deform_attn_jnp
from tests.test_msda import _coherent_locations

# compile-heavy (full model / Pallas kernel graphs): slow tier
pytestmark = pytest.mark.slow


def to_flat_lhp(loc, w):
    """[b, q, h, l, p, (2)] -> flat (l, h, p, (2)) channel layout."""
    b, q, h, l, p = w.shape
    loc_f = loc.transpose(0, 1, 3, 2, 4, 5).reshape(b, q, l * h * p * 2)
    w_f = w.transpose(0, 1, 3, 2, 4).reshape(b, q, l * h * p)
    return loc_f, w_f


@pytest.mark.parametrize(
    "shapes,heads,points,stride",
    [
        (((30, 25),), 8, 8, 4),
        (((32, 22), (16, 11)), 4, 4, 4),
        (((29, 50), (15, 25), (8, 13), (4, 7)), 8, 8, 4),
        # stride-2 windows (the production SCA/TSA geometry: wrows 12/10
        # at halo 9/7 with finer window-start quantization)
        (((30, 25),), 8, 8, 2),
        (((29, 50), (15, 25), (8, 13), (4, 7)), 8, 8, 2),
    ],
)
def test_hi_forward_matches_reference(shapes, heads, points, stride):
    from bevformer_tpu.kernels import msda_hi as mh

    rng = np.random.RandomState(7)
    # v3 tiles cover cap_tile QUERIES (one point stream): keep the
    # per-tile row span realistic (production: 512 of 40448 queries over
    # 116 rows ~ 1.5 rows/tile)
    b, q, d = 2, 1024, 32
    k = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = rng.randn(b, k, heads, d).astype(np.float32) * 0.5
    loc = _coherent_locations(rng, b, q, heads, shapes, points)
    w = rng.rand(b, q, heads, l, points).astype(np.float32)

    loc_f, w_f = to_flat_lhp(loc, w)
    dm = mh.window_drop_mass_hi(
        shapes, jnp.asarray(loc_f), jnp.asarray(w_f),
        heads=heads, points=points, stride=stride, halo=8, cap_tile=64,
    )
    assert float(dm.sum()) == 0.0, dm
    out = np.asarray(mh._forward_hi(
        jnp.asarray(value.reshape(b, k, heads * d)), shapes,
        jnp.asarray(loc_f), jnp.asarray(w_f),
        heads=heads, points=points, stride=stride, halo=8, cap_tile=64,
        interpret=True,
    ))
    ref = np.asarray(ms_deform_attn_jnp(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)
    ))
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(out - ref).max() < 2e-5 * scale, (
        np.abs(out - ref).max(), scale
    )


def test_hi_forward_oob_and_bf16():
    """Out-of-image sampling locations follow grid_sample zeros semantics;
    bf16 compute stays within rounding tolerance."""
    from bevformer_tpu.kernels import msda_hi as mh

    rng = np.random.RandomState(3)
    shapes = ((30, 25),)
    b, q, heads, points, d = 1, 512, 8, 4, 32
    k = sum(h * w for h, w in shapes)
    value = rng.randn(b, k, heads, d).astype(np.float32) * 0.5
    loc = _coherent_locations(rng, b, q, heads, shapes, points)
    # push some x far out of the image (y stays coherent)
    loc[..., 0] = rng.uniform(-0.4, 1.4, loc[..., 0].shape)
    w = rng.rand(b, q, heads, 1, points).astype(np.float32)
    loc_f, w_f = to_flat_lhp(loc, w)
    ref = np.asarray(ms_deform_attn_jnp(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)
    ))
    scale = max(np.abs(ref).max(), 1e-6)

    out = np.asarray(mh._forward_hi(
        jnp.asarray(value.reshape(b, k, heads * d)), shapes,
        jnp.asarray(loc_f), jnp.asarray(w_f),
        heads=heads, points=points, stride=4, halo=8, cap_tile=64,
        interpret=True,
    ))
    assert np.abs(out - ref).max() < 2e-5 * scale

    outb = np.asarray(mh._forward_hi(
        jnp.asarray(value.reshape(b, k, heads * d)), shapes,
        jnp.asarray(loc_f), jnp.asarray(w_f),
        heads=heads, points=points, stride=4, halo=8, cap_tile=64,
        compute_dtype=jnp.bfloat16, interpret=True,
    ))
    assert np.abs(outb - ref).mean() < 0.01 * scale


def test_hi_value_cm_matches_row_major():
    """The CHANNEL-MAJOR value path (value_cm=[b, h*d, k], the layout the
    attention modules' _DenseCM projections emit) matches the row-major
    path in both the forward and the custom backward."""
    from bevformer_tpu.kernels import msda_hi as mh

    rng = np.random.RandomState(11)
    shapes = ((32, 22), (16, 11))
    b, q, heads, points, d = 2, 512, 4, 4, 32
    l = len(shapes)
    k = sum(h * w for h, w in shapes)
    value = jnp.array(rng.randn(b, k, heads * d), jnp.float32) * 0.5
    loc = _coherent_locations(rng, b, q, heads, shapes, points)
    w = rng.rand(b, q, heads, l, points).astype(np.float32)
    loc_f, w_f = to_flat_lhp(loc, w)
    loc_f, w_f = jnp.asarray(loc_f), jnp.asarray(w_f)
    cot = jnp.array(rng.randn(b, q, heads * d), jnp.float32)
    kw = dict(heads=heads, points=points, stride=4, halo=8, cap_tile=64)

    def loss_rm(v, lf, wf):
        out = mh.ms_deform_attn_hi(v, shapes, lf, wf, **kw)
        return (out * cot).sum(), out

    def loss_cm(vc, lf, wf):
        out = mh.ms_deform_attn_hi(None, shapes, lf, wf, value_cm=vc, **kw)
        return (out * cot).sum(), out

    (_, out_rm), g_rm = jax.value_and_grad(
        loss_rm, argnums=(0, 1, 2), has_aux=True
    )(value, loc_f, w_f)
    (_, out_cm), g_cm = jax.value_and_grad(
        loss_cm, argnums=(0, 1, 2), has_aux=True
    )(jnp.swapaxes(value, 1, 2), loc_f, w_f)
    np.testing.assert_allclose(
        np.asarray(out_cm), np.asarray(out_rm), rtol=0, atol=1e-5
    )
    # dValue comes back channel-major — compare transposed
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(g_cm[0], 1, 2)), np.asarray(g_rm[0]),
        rtol=0, atol=1e-5,
    )
    for a, b_ in zip(g_cm[1:], g_rm[1:]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=0, atol=1e-5
        )


@pytest.mark.parametrize(
    "shapes,heads,points,stride",
    [
        (((30, 25),), 8, 8, 4),
        (((29, 50), (15, 25), (8, 13), (4, 7)), 8, 8, 4),
        (((30, 25),), 8, 8, 2),
    ],
)
def test_hi_backward_matches_oracle(shapes, heads, points, stride):
    """v3 scatter-free backward vs autodiff of the XLA oracle."""
    from bevformer_tpu.kernels import msda_hi as mh

    # the 4-level interpret-mode backward produces an executable large
    # enough to segfault jax's disk-cache writer on this box — skip the
    # cache for this test
    jax.config.update("jax_enable_compilation_cache", False)
    rng = np.random.RandomState(13)
    b, q, d = 1, 1024, 32
    k = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = jnp.array(rng.randn(b, k, heads, d), jnp.float32)
    loc = jnp.array(_coherent_locations(rng, b, q, heads, shapes, points))
    w = jnp.array(rng.rand(b, q, heads, l, points), jnp.float32)
    cot = jnp.array(rng.randn(b, q, heads * d), jnp.float32)
    loc_f, w_f = to_flat_lhp(np.asarray(loc), np.asarray(w))
    loc_f, w_f = jnp.asarray(loc_f), jnp.asarray(w_f)

    def loss_oracle(v, lo, ww_):
        return (ms_deform_attn_jnp(v, shapes, lo, ww_) * cot).sum()

    def loss_hi(v, lf, wf):
        out = mh.ms_deform_attn_hi(
            v.reshape(b, k, heads * d), shapes, lf, wf,
            heads=heads, points=points, stride=stride, halo=8,
            cap_tile=64,
        )
        return (out * cot).sum()

    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(value, loc, w)
    gh = jax.grad(loss_hi, argnums=(0, 1, 2))(value, loc_f, w_f)
    # map oracle grads to the flat (l, h, p) layout for comparison
    glo_f, gwo_f = to_flat_lhp(np.asarray(go[1]), np.asarray(go[2]))
    ref = [np.asarray(go[0]).reshape(b, k, heads * d), glo_f, gwo_f]
    gh = [np.asarray(gh[0]).reshape(b, k, heads * d), gh[1], gh[2]]
    for name, a, b_ in zip(("value", "loc", "attw"), ref, gh):
        b_ = np.asarray(b_)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(b_ - a).max() < 2e-4 * scale, (
            name, np.abs(b_ - a).max(), scale
        )
    jax.config.update("jax_enable_compilation_cache", True)


def test_hi_backward_dval_head_chunked(monkeypatch):
    """Head-chunked dValue pass (scoped-VMEM guard for wide windows, e.g.
    the decoder's wrows-49 geometry) must equal the single-call result."""
    from bevformer_tpu.kernels import msda_hi as mh

    jax.config.update("jax_enable_compilation_cache", False)
    rng = np.random.RandomState(17)
    shapes, heads, points, stride = ((30, 25),), 8, 8, 4
    b, q, d = 1, 256, 32
    k = sum(h * w for h, w in shapes)
    l = len(shapes)
    value = jnp.array(rng.randn(b, k, heads, d), jnp.float32)
    loc = jnp.array(_coherent_locations(rng, b, q, heads, shapes, points))
    w = jnp.array(rng.rand(b, q, heads, l, points), jnp.float32)
    cot = jnp.array(rng.randn(b, q, heads * d), jnp.float32)
    loc_f, w_f = to_flat_lhp(np.asarray(loc), np.asarray(w))
    loc_f, w_f = jnp.asarray(loc_f), jnp.asarray(w_f)

    def loss_hi(v, lf, wf):
        out = mh.ms_deform_attn_hi(
            v.reshape(b, k, heads * d), shapes, lf, wf,
            heads=heads, points=points, stride=stride, halo=8,
            cap_tile=64,
        )
        return (out * cot).sum()

    g_one = jax.grad(loss_hi, argnums=(0, 1, 2))(value, loc_f, w_f)
    # force ~one head per chunk (per-head block at these shapes is
    # 13*32*128*4 = 213k bytes)
    monkeypatch.setenv("MSDA_BWD_DVAL_VMEM", str(300 * 1024))
    jax.clear_caches()
    g_chunk = jax.grad(loss_hi, argnums=(0, 1, 2))(value, loc_f, w_f)
    for name, a, b_ in zip(("value", "loc", "attw"), g_one, g_chunk):
        np.testing.assert_allclose(
            np.asarray(b_), np.asarray(a), rtol=0, atol=1e-6, err_msg=name
        )
    jax.config.update("jax_enable_compilation_cache", True)


def test_hi_per_head_halos():
    """Per-head halo tuples (heads with a small row spread get narrow
    windows, tools/audit_halo.py perhead): forward + backward must match
    the oracle exactly when each head's spread fits ITS halo, and the
    drop-mass audit must see per-head windows."""
    from bevformer_tpu.kernels import msda_hi as mh

    rng = np.random.RandomState(11)
    shapes = ((24, 16), (12, 8))
    b, q, heads, points, d = 1, 256, 4, 2, 16
    l = len(shapes)
    k = sum(hh * ww for hh, ww in shapes)
    value = rng.randn(b, k, heads, d).astype(np.float32) * 0.5
    # heads 0/2 tight (rows within +-0.15 grid units of the sorted
    # anchor), heads 1/3 wide (+-2.5 rows at level 0)
    base_y = np.sort(rng.rand(b, q).astype(np.float32), axis=1)
    spread = np.array([0.01, 0.2, 0.01, 0.2], np.float32)
    loc = rng.rand(b, q, heads, l, points, 2).astype(np.float32)
    loc[..., 1] = (
        base_y[:, :, None, None, None]
        + (rng.rand(b, q, heads, l, points) - 0.5)
        * spread[None, None, :, None, None]
    )
    loc = np.clip(loc, 0.0, 0.999).astype(np.float32)
    w = rng.rand(b, q, heads, l, points).astype(np.float32)
    loc_f, w_f = to_flat_lhp(loc, w)
    halos = (3, 9, 3, 9)

    dm = mh.window_drop_mass_hi(
        shapes, jnp.asarray(loc_f), jnp.asarray(w_f),
        heads=heads, points=points, stride=4, halo=halos, cap_tile=32,
    )
    assert float(dm.sum()) == 0.0, dm
    # the tight halo alone would drop mass on the wide heads
    dm_bad = mh.window_drop_mass_hi(
        shapes, jnp.asarray(loc_f), jnp.asarray(w_f),
        heads=heads, points=points, stride=4, halo=3, cap_tile=32,
    )
    assert float(dm_bad.sum()) > 0.0

    ref = np.asarray(ms_deform_attn_jnp(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w)
    ))
    scale = max(np.abs(ref).max(), 1e-6)

    vflat = jnp.asarray(value.reshape(b, k, heads * d))

    def f(v, lo, aw):
        o = mh.ms_deform_attn_hi(
            v, shapes, lo, aw, heads=heads, points=points, stride=4,
            halo=halos, cap_tile=32,
        )
        return o, (o * jnp.arange(o.size).reshape(o.shape) * 1e-4).sum()

    out, _ = f(vflat, jnp.asarray(loc_f), jnp.asarray(w_f))
    assert np.abs(np.asarray(out) - ref).max() < 2e-5 * scale

    def fr(v, lo, aw):
        o = ms_deform_attn_jnp(
            v.reshape(b, k, heads, d), shapes,
            lo.reshape(b, q, l, heads, points, 2).transpose(
                0, 1, 3, 2, 4, 5),
            aw.reshape(b, q, l, heads, points).transpose(0, 1, 3, 2, 4),
        ).reshape(b, q, heads * d)
        return (o * jnp.arange(o.size).reshape(o.shape) * 1e-4).sum()

    g = jax.grad(lambda *a: f(*a)[1], argnums=(0, 1, 2))(
        vflat, jnp.asarray(loc_f), jnp.asarray(w_f))
    gr = jax.grad(fr, argnums=(0, 1, 2))(
        vflat, jnp.asarray(loc_f), jnp.asarray(w_f))
    for name, a_, b_ in zip(("dval", "dloc", "dattw"), g, gr):
        denom = float(jnp.abs(b_).max()) + 1e-9
        err = float(jnp.abs(a_ - b_).max()) / denom
        assert err < 5e-5, (name, err)


def test_hi_lw_matches_flat_entry():
    """Packed-lw entry (`ms_deform_attn_hi_lw`: sorted (p,l,h) offsets |
    weights + hoisted reference points, the layout `_fused_forward` feeds
    straight from the sort gather) matches the flat-loc entry in forward
    AND backward, including bf16 lw storage."""
    from bevformer_tpu.kernels import msda_hi as mh

    rng = np.random.RandomState(17)
    shapes = ((32, 22), (16, 11))
    b, q, heads, points, d = 2, 512, 4, 4, 32
    l = len(shapes)
    nch = l * heads * points
    k = sum(hh * ww for hh, ww in shapes)
    value_cm = jnp.array(rng.randn(b, heads * d, k), jnp.float32) * 0.5
    loc = _coherent_locations(rng, b, q, heads, shapes, points)
    w = rng.rand(b, q, heads, l, points).astype(np.float32)
    loc_f, w_f = to_flat_lhp(loc, w)
    # packed form: ref = per-item anchor, off = loc - ref, channels
    # reordered (l, h, p) -> (p, l, h)
    ref = loc.reshape(b, q, heads, l, points, 2).mean(axis=(2, 3, 4))
    off = loc.reshape(b, q, heads, l, points, 2) - ref[:, :, None, None, None]
    off_plh = off.transpose(0, 1, 4, 3, 2, 5).reshape(b, q, 2 * nch)
    w_plh = w.reshape(b, q, heads, l, points).transpose(
        0, 1, 4, 3, 2).reshape(b, q, nch)
    lw = np.concatenate([off_plh, w_plh], axis=-1)
    cot = jnp.array(rng.randn(b, q, heads * d), jnp.float32)
    kw = dict(heads=heads, points=points, stride=4, halo=8, cap_tile=64)

    def loss_flat(vc, lf, wf):
        out = mh.ms_deform_attn_hi(None, shapes, lf, wf, value_cm=vc, **kw)
        return (out * cot).sum(), out

    def loss_lw(vc, lw_):
        out = mh.ms_deform_attn_hi_lw(vc, lw_, jnp.asarray(ref), shapes, **kw)
        return (out * cot).sum(), out

    (_, out_f), g_f = jax.value_and_grad(
        loss_flat, argnums=(0, 1, 2), has_aux=True
    )(value_cm, jnp.asarray(loc_f), jnp.asarray(w_f))
    (_, out_l), g_l = jax.value_and_grad(
        loss_lw, argnums=(0, 1), has_aux=True
    )(value_cm, jnp.asarray(lw, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out_l), np.asarray(out_f), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_l[0]), np.asarray(g_f[0]), rtol=0, atol=2e-5
    )
    # repack the flat-entry loc/attw grads into lw columns: d(off) ==
    # d(loc) (loc = off + stop_grad(ref))
    dloc_p = np.asarray(g_f[1]).reshape(b, q, l, heads, points, 2)
    dw_p = np.asarray(g_f[2]).reshape(b, q, l, heads, points)
    dlw_ref = np.concatenate(
        [
            dloc_p.transpose(0, 1, 4, 2, 3, 5).reshape(b, q, 2 * nch),
            dw_p.transpose(0, 1, 4, 2, 3).reshape(b, q, nch),
        ],
        axis=-1,
    )
    # off = loc - ref here, and the lw path recomposes off + ref in f32:
    # one-ulp location shifts flip bilinear cells for a few items, so the
    # loc/attw gradients (scale ~|value|*W) differ at the 1e-4 level
    gscale = max(np.abs(dlw_ref).max(), 1e-6)
    np.testing.assert_allclose(
        np.asarray(g_l[1]), dlw_ref, rtol=0, atol=2e-5 * gscale
    )

    # bf16 lw storage: offsets/weights round to bf16 but loc math is f32
    out_b = mh.ms_deform_attn_hi_lw(
        value_cm, jnp.asarray(lw, jnp.bfloat16), jnp.asarray(ref), shapes,
        compute_dtype=jnp.bfloat16, **kw,
    )
    scale = max(np.abs(np.asarray(out_f)).max(), 1e-6)
    assert np.abs(np.asarray(out_b) - np.asarray(out_f)).mean() < 0.01 * scale


def test_unsort_reduce_matches_naive():
    """Fused unsort + z-anchor reduce == permute_rows -> reshape -> sum,
    in value and gradient."""
    from bevformer_tpu.models.attention import permute_rows, unsort_reduce

    rng = np.random.RandomState(5)
    b, nq, nz, e = 2, 128, 4, 32
    n = nq * nz
    out_s = jnp.array(rng.randn(b, n, e), jnp.float32)
    perm = jnp.argsort(jnp.array(rng.rand(b, n)), axis=1)
    inv = jnp.argsort(perm, axis=1)
    cot = jnp.array(rng.randn(b, nq, e), jnp.float32)

    def naive(o):
        u = permute_rows(o, inv, perm)
        return (u.reshape(b, nq, nz, e).sum(axis=2) * cot).sum()

    def fused(o):
        return (unsort_reduce(o, inv, perm, nz) * cot).sum()

    v_n, g_n = jax.value_and_grad(naive)(out_s)
    v_f, g_f = jax.value_and_grad(fused)(out_s)
    np.testing.assert_allclose(float(v_f), float(v_n), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_n), rtol=0, atol=1e-6
    )
