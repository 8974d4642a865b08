"""Can a Pallas per-row DMA gather beat the ~25 GB/s XLA gather engine?

The fused SCA layer moves ~400 MB/layer through row gathers (sorted
permute + unsort + capacity routing, models/attention.py) — ~16 ms/layer
at the measured take_along_axis streaming rate, the bulk of the
SCA-inner-minus-kernel overhead. This microbench times the same shape
([6, 40960, 256] bf16 rows, random permutation) through:

  * take_along_axis (the shipped permute_rows path)
  * a Pallas kernel that issues one async HBM->VMEM copy per row with a
    ring of in-flight DMA semaphores (idx in SMEM blocks, src untiled in
    ANY/HBM)

Env: NSEM (ring size, default 8), T (rows/step, default 512), REPS.
Usage: python tools/bench_dma_gather.py [xla pallas ...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, M, E = 6, 40960, 256
NSEM = int(os.environ.get("NSEM", "8"))
T = int(os.environ.get("T", "4096"))
REPS = int(os.environ.get("REPS", "64"))
DT = jnp.bfloat16

rng = np.random.RandomState(0)
src = jnp.array(rng.randn(B, M, E), DT)
idx = jnp.array(
    np.stack([rng.permutation(M) for _ in range(B)]), jnp.int32
)


def _gather_kernel(idx_ref, src_ref, out_ref, sems):
    b = pl.program_id(0)

    def issue(r, slot):
        i = idx_ref[0, 0, r // 512, jax.lax.rem(r, 512)]
        pltpu.make_async_copy(
            src_ref.at[b, pl.ds(i, 1), :],
            out_ref.at[0, pl.ds(r, 1), :],
            sems.at[slot],
        ).start()

    def body(r, carry):
        slot = jax.lax.rem(r, NSEM)

        @pl.when(r >= NSEM)
        def _():
            # same-shape wait decrements the slot's semaphore
            pltpu.make_async_copy(
                src_ref.at[b, pl.ds(0, 1), :],
                out_ref.at[0, pl.ds(0, 1), :],
                sems.at[slot],
            ).wait()

        issue(r, slot)
        return carry

    jax.lax.fori_loop(0, T, body, 0)

    def drain(s, carry):
        pltpu.make_async_copy(
            src_ref.at[b, pl.ds(0, 1), :],
            out_ref.at[0, pl.ds(0, 1), :],
            sems.at[jax.lax.rem(T + s, NSEM)],
        ).wait()
        return carry

    jax.lax.fori_loop(0, NSEM, drain, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_gather(src, idx, interpret=False):
    b, m, e = src.shape
    assert m % T == 0 and T % 512 == 0, (m, T)
    # SMEM blocks need 8/128-divisible trailing dims: view the indices as
    # [b, chunks, 8, 512] and hand each grid step its (8, 512) chunk
    idx4 = idx.reshape(b, m // T, T // 512, 512)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, m // T),
        in_specs=[
            pl.BlockSpec(
                (1, 1, T // 512, 512), lambda b_, t: (b_, t, 0, 0),
                memory_space=pltpu.MemorySpace.SMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY),
        ],
        out_specs=pl.BlockSpec((1, T, e), lambda b_, t: (b_, t, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, m, e), src.dtype),
        interpret=interpret,
    )(idx4, src)


def timed(label, fn, *args):
    def chained(s, i):
        def body(c, _):
            out = fn(s + c.astype(s.dtype) * 0, i)
            return c + out.ravel()[0].astype(jnp.float32) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return c
    j = jax.jit(chained)
    t0 = time.perf_counter()
    float(j(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(j(*args))
    dt = (time.perf_counter() - t0) / REPS
    gb = B * M * E * src.dtype.itemsize / 1e9
    print(
        f"{label}: {dt*1e3:.2f} ms  ({gb/dt:.0f} GB/s) (compile {tc:.0f}s)",
        flush=True,
    )


def main():
    modes = sys.argv[1:] or ["nop", "xla", "pallas"]
    for m in modes:
        if m == "nop":
            timed("nop", lambda s, i: s, src, idx)
        elif m == "xla":
            timed(
                "xla take_along_axis",
                lambda s, i: jnp.take_along_axis(s, i[:, :, None], axis=1),
                src, idx,
            )
        elif m == "pallas":
            timed(
                f"pallas dma (T={T}, nsem={NSEM})",
                lambda s, i: pallas_gather(s, i),
                src, idx,
            )
    # correctness
    ref = jnp.take_along_axis(src, idx[:, :, None], axis=1)
    got = pallas_gather(src, idx)
    err = jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)).max()
    print(f"max |pallas - xla| = {float(err):.3e}", flush=True)


if __name__ == "__main__":
    main()
