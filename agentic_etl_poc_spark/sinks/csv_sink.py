"""Single-file CSV sink.

The reference writes exactly one CSV file and verify re-reads that one path
(reference: etl_agent/ops.py:28-32, 49-109) — single-file output IS the
contract.  A distributed writer emits a directory of parts, so we write to
a temp dir and promote the single part to the target path.

``coalesce(1)`` serializes only the final write stage — upstream transforms
keep full parallelism (coalesce does not repartition the whole plan; it
narrows the last stage).  That's the right trade for the reference's
small-aggregate outputs.  For big outputs at the 100 TB ceiling, set
``single_file=False`` and get a standard partitioned directory instead —
the plan language stays the same, the sink scales.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    include_header: bool = True,
    single_file: bool = True,
    row_count: int | None = None,
) -> str:
    """Write df to ``path``; returns the reference-shaped message
    ``"wrote N rows to path"``.  ``row_count`` lets callers that already
    counted (the DQ gate) avoid a recount."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if row_count is None:
        row_count = df.count()

    if not single_file:
        df.write.mode("overwrite").option("header", include_header).csv(path)
        return f"wrote {row_count:,} rows to {path}"

    tmp = tempfile.mkdtemp(prefix="csv_sink_", dir=os.path.dirname(path) or ".")
    try:
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("header", include_header)
            .csv(tmp)
        )
        parts = glob.glob(os.path.join(tmp, "part-*"))
        if len(parts) != 1:  # pragma: no cover - coalesce(1) guarantees one
            raise RuntimeError(f"expected exactly 1 part file, got {len(parts)}")
        if os.path.exists(path):
            os.remove(path)
        shutil.move(parts[0], path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return f"wrote {row_count:,} rows to {path}"
