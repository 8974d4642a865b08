"""Multi-process jax.distributed bring-up test (2 CPU processes).

Validates the machinery `tools/dist_train.sh` relies on: two subprocesses
initialize via `runtime.distributed.maybe_initialize()` (the same env
contract the launcher exports), see `process_count()==2`, assemble a
dp-sharded global batch from per-process local slices, and compute
gradients that agree exactly with a single-process run on the full batch —
the reference's DDP-allreduce equivalence
(`/root/reference/projects/mmdet3d_plugin/bevformer/apis/mmdet_train.py:75-79`).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["BEVF_REPO"])
from bevformer_tpu.runtime.distributed import maybe_initialize

ok = maybe_initialize()
assert ok, "maybe_initialize returned False under JAX_NUM_PROCESSES=2"
import jax
import jax.numpy as jnp
import numpy as np

assert jax.process_count() == 2, jax.process_count()
from bevformer_tpu.runtime import mesh as mesh_lib

m = mesh_lib.make_mesh(dp=len(jax.devices()), sp=1)
rank = jax.process_index()

# deterministic global batch; each process holds its contiguous half
rng = np.random.RandomState(0)
x = rng.randn(8, 4).astype(np.float32)
y = rng.randn(8).astype(np.float32)
w = jnp.asarray(rng.randn(4).astype(np.float32))
lo, hi = rank * 4, rank * 4 + 4

with mesh_lib.activate(m):
    batch = mesh_lib.shard_batch(m, {"x": x[lo:hi], "y": y[lo:hi]})

    @jax.jit
    def grad_fn(w, b):
        return jax.grad(
            lambda w: jnp.mean((b["x"] @ w - b["y"]) ** 2)
        )(w)

    g = np.asarray(jax.device_get(grad_fn(w, batch)))
print("GRAD " + json.dumps({"rank": int(rank), "grad": g.tolist()}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_grad_agreement(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # breaks axon plugin registration
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(rank),
            BEVF_REPO=REPO,
            JAX_COMPILATION_CACHE_DIR="/root/.jax_cache",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
                cwd=REPO,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    grads = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("GRAD "):
                rec = json.loads(line[5:])
                grads[rec["rank"]] = np.array(rec["grad"])
    assert set(grads) == {0, 1}, outs

    # single-process full-batch reference
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = rng.randn(8, 4).astype(np.float32)
    y = rng.randn(8).astype(np.float32)
    w = jnp.asarray(rng.randn(4).astype(np.float32))
    ref = np.asarray(
        jax.grad(lambda w: jnp.mean((jnp.asarray(x) @ w - y) ** 2))(w)
    )
    np.testing.assert_allclose(grads[0], ref, rtol=1e-6)
    np.testing.assert_allclose(grads[0], grads[1], rtol=0)


GATHER_WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["BEVF_REPO"])
from bevformer_tpu.runtime.distributed import allgather_results, maybe_initialize

ok = maybe_initialize()
assert ok
import jax
import numpy as np

nproc = jax.process_count()
rank = jax.process_index()


def make_local(r):
    # deterministic variable-size per-sample results; ranks differ in
    # sample count too (uneven split)
    rng = np.random.RandomState(100 + r)
    n_samples = 120 + r  # ~1k total over 8 ranks
    out = []
    for i in range(n_samples):
        n = int(rng.randint(0, 7))  # 0..6 boxes
        out.append(rng.randn(n, 11).astype(np.float32))
    return out

local = make_local(rank)
gathered = allgather_results(local, width=11, chunk_samples=32)

expect = []
for r in range(nproc):
    expect.extend(make_local(r))
assert len(gathered) == len(expect), (len(gathered), len(expect))
for a, b in zip(gathered, expect):
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_array_equal(a, b)
print("GATHER_OK rank=%d total=%d" % (rank, len(gathered)), flush=True)
"""


@pytest.mark.slow
def test_eight_process_chunked_allgather(tmp_path):
    """~1k variable-size results over 8 CPU processes through the CHUNKED
    allgather (chunk_samples=32 -> 4 chunks/rank; round-4 verdict asked for
    a bounded-memory path before real multi-host eval)."""
    worker = tmp_path / "gather_worker.py"
    worker.write_text(GATHER_WORKER)
    port = _free_port()
    procs = []
    nproc = 8
    for rank in range(nproc):
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES=str(nproc),
            JAX_PROCESS_ID=str(rank),
            BEVF_REPO=REPO,
            JAX_COMPILATION_CACHE_DIR="/root/.jax_cache",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
                cwd=REPO,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    total = 120 * nproc + sum(range(nproc))
    for out in outs:
        assert f"GATHER_OK" in out and f"total={total}" in out, out[-2000:]
