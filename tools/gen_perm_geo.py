"""Generate REAL-geometry SCA item-sort permutations for the permgeo probe.

Computes reference_points_cam from the synthetic example frame (same camera
rig as __graft_entry__._example_inputs), runs sca_capacity_precompute with
presort OFF (raster query order -> global item sort) and ON (queries
pre-ordered by mean anchor row -> residual local sort), and saves the two
[cams, cap*nz] permutations to /tmp/perm_raster.npy / /tmp/perm_resid.npy
for tools/bench_sca_probe.py permgeo.

Runs on CPU (pure geometry).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from bevformer_tpu.utils import cpu_cache_dir

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())

import numpy as np
import jax.numpy as jnp


def main():
    from bevformer_tpu.configs import get_config
    from bevformer_tpu.core import geometry
    from bevformer_tpu.models.attention import sca_capacity_precompute
    from __graft_entry__ import _example_inputs

    cfg = get_config(os.environ.get("BENCH_CONFIG", "bevformer_base"))
    _, can_bus, lidar2img, _, _ = _example_inputs(cfg)
    ref_3d = geometry.reference_points_3d(
        cfg.bev_h, cfg.bev_w, cfg.pc_range[5] - cfg.pc_range[2],
        cfg.num_points_in_pillar, bs=1,
    )
    rc, bm = geometry.point_sampling(
        ref_3d, cfg.pc_range, lidar2img, cfg.data.img_size
    )
    for presort, path in ((False, "/tmp/perm_raster.npy"),
                          (True, "/tmp/perm_resid.npy")):
        pre = sca_capacity_precompute(
            rc, bm, cfg.sca_capacity_ratio, presort_queries=presort
        )
        perm = np.asarray(pre["sort_perm"])  # [bs*cams, cap*nz]
        np.save(path, perm.astype(np.int32))
        jumps = np.abs(np.diff(perm.astype(np.int64), axis=1))
        print(f"{path}: shape {perm.shape} mean|jump| "
              f"{jumps.mean(axis=1).round(0).tolist()}")


if __name__ == "__main__":
    main()
