"""Core numerics: box codec round-trip, reference points, point sampling,
and the prev-BEV rotation vs a PIL oracle."""

import math

import numpy as np
import jax.numpy as jnp

from bevformer_tpu.core import boxes, geometry


def test_normalize_denormalize_roundtrip():
    rng = np.random.RandomState(0)
    b = rng.randn(50, 9).astype(np.float32)
    b[:, 3:6] = np.abs(b[:, 3:6]) + 0.5  # positive sizes
    b[:, 6] = rng.uniform(-math.pi, math.pi, 50)
    code = boxes.normalize_bbox(jnp.array(b))
    assert code.shape == (50, 10)
    back = np.asarray(boxes.denormalize_bbox(code))
    np.testing.assert_allclose(back, b, rtol=1e-5, atol=1e-5)


def test_gravity_bottom_roundtrip():
    rng = np.random.RandomState(1)
    b = rng.randn(10, 9).astype(np.float32)
    b[:, 3:6] = np.abs(b[:, 3:6]) + 0.1
    g = boxes.gravity_center(jnp.array(b))
    back = np.asarray(boxes.bottom_center(g))
    np.testing.assert_allclose(back, b, rtol=1e-6, atol=1e-6)


def test_reference_points_3d_shape_and_range():
    ref = geometry.reference_points_3d(10, 20, 8.0, 4, bs=2)
    assert ref.shape == (2, 4, 200, 3)
    r = np.asarray(ref)
    assert r.min() > 0 and r.max() < 1
    # z values: (0.5, 8-0.5 in 4 steps)/8
    expected_z = np.linspace(0.5, 7.5, 4) / 8.0
    np.testing.assert_allclose(np.unique(r[0, :, 0, 2]), expected_z, rtol=1e-6)
    # first x coordinate = 0.5/W
    assert abs(r[0, 0, 0, 0] - 0.5 / 20) < 1e-6


def test_reference_points_2d_layout():
    ref = np.asarray(geometry.reference_points_2d(4, 6, bs=1))[0, :, 0]
    # row-major: first bev_w entries share y
    assert np.allclose(ref[:6, 1], ref[0, 1])
    assert np.allclose(ref[:6, 0], (np.arange(6) + 0.5) / 6)


def test_point_sampling_pinhole():
    """A point straight ahead of a camera must project to the image center."""
    pc_range = [-50.0, -50.0, -5.0, 50.0, 50.0, 3.0]
    img_h, img_w = 100, 200
    # camera at origin looking along +x (lidar frame): u = fy*(-y)+cx etc.
    # Build lidar2img = intrinsic @ extrinsic for a simple frontal camera.
    f = 50.0
    intr = np.array(
        [[f, 0, img_w / 2, 0], [0, f, img_h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]]
    )
    # extrinsic: lidar (x fwd, y left, z up) -> cam (x right, y down, z fwd)
    extr = np.array(
        [
            [0, -1, 0, 0],
            [0, 0, -1, 0],
            [1, 0, 0, 0],
            [0, 0, 0, 1],
        ],
        dtype=np.float64,
    )
    l2i = (intr @ extr)[None, None]  # [1, 1, 4, 4]

    # normalized ref point at metric (25, 0, 0): x_norm=(25+50)/100
    ref = jnp.array([[[[0.75, 0.5, 5.0 / 8.0]]]], jnp.float32)  # bs,D,Q,3
    cam_xy, mask = geometry.point_sampling(
        ref, pc_range, jnp.array(l2i, jnp.float32), (img_h, img_w)
    )
    assert bool(mask[0, 0, 0, 0])
    np.testing.assert_allclose(
        np.asarray(cam_xy)[0, 0, 0, 0], [0.5, 0.5], atol=1e-6
    )
    # a point behind the camera is masked out
    ref_back = jnp.array([[[[0.25, 0.5, 0.625]]]], jnp.float32)
    _, mask_b = geometry.point_sampling(
        ref_back, pc_range, jnp.array(l2i, jnp.float32), (img_h, img_w)
    )
    assert not bool(mask_b[0, 0, 0, 0])


def test_rotate_matches_pil_nearest():
    from PIL import Image

    rng = np.random.RandomState(3)
    h = w = 50
    img = (rng.rand(h, w) * 255).astype(np.float32)
    for angle in (0.0, 7.3, -12.9, 33.0):
        for center in ((25.0, 25.0), (100.0, 100.0), (10.0, 40.0)):
            got = np.asarray(
                geometry.rotate_image_nearest(
                    jnp.array(img[..., None]), jnp.float32(angle), center
                )
            )[..., 0]
            pil = Image.fromarray(img)
            exp = np.asarray(
                pil.rotate(
                    angle,
                    resample=Image.NEAREST,
                    center=center,
                    fillcolor=0,
                )
            )
            # PIL and the torchvision tensor path differ by sub-pixel
            # rounding on exact half-integers; demand near-total agreement.
            frac_diff = np.mean(got != exp)
            assert frac_diff < 0.02, (angle, center, frac_diff)


def test_bev_shift_zero_motion():
    s = geometry.bev_shift(
        jnp.zeros(2), jnp.zeros(2), jnp.zeros(2), (0.512, 0.512), 200, 200
    )
    np.testing.assert_allclose(np.asarray(s), 0.0, atol=1e-7)


def test_quat_helpers():
    # 90deg about z: (w,x,y,z) = (cos45, 0, 0, sin45)
    q = np.array([math.cos(math.pi / 4), 0, 0, math.sin(math.pi / 4)])
    yaw = geometry.quat_yaw(q)
    assert abs(yaw - math.pi / 2) < 1e-9
    rot = geometry.quat_to_rot(q)
    np.testing.assert_allclose(rot @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    tm = geometry.transform_matrix([1, 2, 3], q)
    tm_inv = geometry.transform_matrix([1, 2, 3], q, inverse=True)
    np.testing.assert_allclose(tm @ tm_inv, np.eye(4), atol=1e-12)
