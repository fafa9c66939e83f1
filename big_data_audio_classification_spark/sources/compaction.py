"""Small-file compaction — the table-maintenance pass every long-lived
100 TB dataset needs.

Streaming sinks, frequent small appends, and over-parallel writers all
degrade a parquet table into thousands of KB-sized files; scan cost
then becomes file-open-bound (driver listing + per-file footer reads),
not data-bound. The fix is periodic rewrite into target-sized files —
what Delta/Iceberg call OPTIMIZE / rewriteDataFiles, expressed here
with plain Spark primitives so it works on any parquet directory:

* `plan_compaction` — decide how many output files a directory needs
  from its current size and a target bytes-per-file (never zero; never
  more files than it already has).
* `compact_parquet` — read → repartition(n) → write to a staging dir,
  then atomically swap. For partitioned tables, pass the partition
  subdirectory; compaction is per-leaf so each run is bounded and
  parallel runs touch disjoint leaves.

Row fidelity is the invariant that matters (rewrites must be lossless
and dedup-free); tests/test_compaction.py pins it along with the file
count contraction.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024  # match maxPartitionBytes


def _data_files(path: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def plan_compaction(path: str, target_bytes: int = DEFAULT_TARGET_BYTES) -> dict:
    """Inspect a parquet leaf directory and plan the rewrite: number of
    current files, total bytes, and the output file count
    ``max(1, ceil(total/target))`` capped at the current count (never
    split further — compaction only merges)."""
    files = _data_files(path)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-total // target_bytes))
    return {
        "n_files": len(files),
        "total_bytes": total,
        "n_output_files": int(min(n_out, max(1, len(files)))),
    }


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict:
    """Rewrite a parquet leaf directory into its planned file count and
    atomically swap it in (write to `<path>.__compact__`, then rename).
    Returns the plan plus rows_before/rows_after for auditability."""
    plan = plan_compaction(path, target_bytes)
    df = spark.read.parquet(path)
    rows_before = df.count()
    staging = path.rstrip("/") + ".__compact__"
    (
        df.repartition(plan["n_output_files"])
        .write.mode("overwrite")
        .parquet(staging)
    )
    rows_after = spark.read.parquet(staging).count()
    if rows_after != rows_before:
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: {rows_before} -> {rows_after}"
        )
    backup = path.rstrip("/") + ".__old__"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return {**plan, "rows": rows_before}
