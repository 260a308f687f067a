"""Session/runtime helpers shared by the benchmark and pipeline drivers."""

from __future__ import annotations

import os

#: Allocator environment for Python UDF workers (and the driver): pyarrow's
#: default jemalloc pool aggressively purges freed pages back to the OS, so
#: every Arrow batch refaults tens of MB of fresh pages; glibc's dynamic
#: mmap threshold likewise munmaps each large numpy buffer. On a steady
#: streaming workload the worker should keep its working set hot: use the
#: system allocator with a high trim/mmap threshold so batch-sized buffers
#: are reused instead of returned. Measured on this sandbox VM (whose
#: first-touch faults are intermittently ~100x slow): a 1.2GB alloc+touch
#: churn per worker dropped 4.3s -> 0.6s at 16 concurrent workers. On a
#: healthy cluster node this is neutral-to-positive for the same reason
#: (fewer page faults + TLB misses in the hot loop).
ALLOCATOR_ENV = {
    "ARROW_DEFAULT_MEMORY_POOL": "system",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
    "MALLOC_MMAP_THRESHOLD_": "268435456",
    "MALLOC_TOP_PAD_": "134217728",
}


def apply_allocator_env(builder):
    """Set the worker allocator env on a SparkSession.Builder (and this
    process, so local-mode daemons inherit it). Call before getOrCreate()."""
    for key, val in ALLOCATOR_ENV.items():
        os.environ.setdefault(key, val)
        builder = builder.config(f"spark.executorEnv.{key}", os.environ[key])
    return builder
