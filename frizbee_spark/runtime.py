"""Session/runtime helpers shared by the benchmark and pipeline drivers."""

from __future__ import annotations

import os

#: Allocator environment for Python UDF workers (and the driver): pyarrow's
#: default jemalloc pool aggressively purges freed pages back to the OS, so
#: every Arrow batch refaults tens of MB of fresh pages (pathologically
#: slow on this sandbox VM's host). The system (glibc) pool instead adapts
#: its mmap threshold after the first large free and then recycles
#: batch-sized buffers from the heap. Deliberately NOT forcing
#: MALLOC_TRIM/TOP_PAD retention: pinning ~1GB of heap per worker times N
#: workers pressured the (overcommitted) host and measurably slowed the
#: JVM-heavy stages at 16 workers; glibc's dynamic thresholds give the
#: reuse without the hoarding.
ALLOCATOR_ENV = {
    "ARROW_DEFAULT_MEMORY_POOL": "system",
}


def apply_allocator_env(builder):
    """Set the worker allocator env on a SparkSession.Builder (and this
    process, so local-mode daemons inherit it). Call before getOrCreate()."""
    for key, val in ALLOCATOR_ENV.items():
        os.environ.setdefault(key, val)
        builder = builder.config(f"spark.executorEnv.{key}", os.environ[key])
    return builder
