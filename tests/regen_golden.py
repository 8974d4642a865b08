"""Regenerate tests/golden_mini_forward.npz (run from the repo root)."""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")
sys.path.insert(0, "tests")
from tests.test_model import mini_config  # noqa: E402

from bevformer_tpu.models import BEVFormer  # noqa: E402

cfg = mini_config()
model = BEVFormer(cfg=cfg)
rng = np.random.RandomState(42)
bs, cams = 1, 6
h, w = cfg.data.img_size
images = jnp.array(rng.randn(bs, cams, h, w, 3) * 0.5, jnp.float32)
can_bus = jnp.array(rng.randn(bs, 18) * 0.1, jnp.float32)
f = 100.0
intr = np.array([[f, 0, w / 2, 0], [0, f, h / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])
extr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1.0]])
l2i = jnp.array(np.tile((intr @ extr)[None, None], (bs, cams, 1, 1)), jnp.float32)
prev = jnp.array(
    rng.randn(bs, cfg.bev_h * cfg.bev_w, cfg.embed_dims) * 0.1, jnp.float32
)
hasp = jnp.ones((bs,), bool)
params = model.init(jax.random.PRNGKey(7), images, can_bus, l2i, prev, hasp)
out = model.apply(params, images, can_bus, l2i, prev, hasp)
np.savez_compressed(
    "tests/golden_mini_forward.npz",
    cls=np.asarray(out["all_cls_scores"], np.float32),
    box=np.asarray(out["all_bbox_preds"], np.float32),
    bev_sum=np.float32(np.asarray(out["bev_embed"], np.float64).sum()),
    bev_slice=np.asarray(out["bev_embed"][0, :8, :8], np.float32),
)
print("regenerated", out["all_cls_scores"].shape)
