from bevformer_tpu.utils.profiler import run_time
from bevformer_tpu.utils.visual import save_tensor

__all__ = ["run_time", "save_tensor", "cpu_cache_dir"]
def cpu_cache_dir() -> str:
    """Host-fingerprinted CPU compile-cache dir.

    XLA:CPU AOT cache entries bake the COMPILING host's CPU feature set;
    loading an entry produced on a different machine can SIGILL (observed:
    a round-4 cache entry with +prefer-no-scatter segfaulted the round-5
    full-suite run in compilation_cache.get_executable_and_time). Keying
    the cache path by the host's CPU flags makes stale foreign entries
    unreachable instead of fatal."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    fp = hashlib.sha1(line.encode()).hexdigest()[:10]
                    break
            else:
                fp = "noflags"
    except OSError:
        fp = "nocpuinfo"
    return f"/root/.jax_cache_cpu_{fp}"
