"""Per-stage checkpoint lineage + metrics (north-rule resumability).

The reference gates operations on a construction-state bitmask
(/root/reference/include/osmtools/OsmTriangulationRegionStore.h:316-325) —
an in-memory lineage.  Here lineage is durable: every pipeline stage writes
its output table idempotently and records a manifest row (stage name, input
fingerprint, row count, partition count, wall time).  Re-running a pipeline
skips stages whose manifest entry matches the current input fingerprint —
resumable from any point, per-partition metrics retained.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageRecord:
    stage: str
    input_fingerprint: str
    out_path: str
    n_rows: int
    n_partitions: int
    wall_sec: float
    finished_at: float


class CheckpointManager:
    """Manifest-driven idempotent stage runner.

    Usage::

        cp = CheckpointManager(spark, "/path/ckpt")
        cells = cp.stage("cells", fp, lambda: build_cells(...))
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.manifest_path = os.path.join(root, "manifest.jsonl")

    # -- manifest ---------------------------------------------------------

    def _read_manifest(self) -> dict[str, StageRecord]:
        out: dict[str, StageRecord] = {}
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                for line in f:
                    rec = StageRecord(**json.loads(line))
                    out[rec.stage] = rec  # last write wins
        return out

    def _append(self, rec: StageRecord) -> None:
        with open(self.manifest_path, "a") as f:
            f.write(json.dumps(asdict(rec)) + "\n")

    # -- stages -----------------------------------------------------------

    def stage(self, name: str, input_fingerprint: str, build) -> DataFrame:
        """Return the stage output, rebuilding only when the input
        fingerprint changed (or no checkpoint exists)."""
        recs = self._read_manifest()
        out_path = os.path.join(self.root, name)
        rec = recs.get(name)
        if rec and rec.input_fingerprint == input_fingerprint and os.path.exists(out_path):
            return self.spark.read.parquet(out_path)

        t0 = time.monotonic()
        df = build()
        # idempotent write: overwrite into the stage directory
        df.write.mode("overwrite").parquet(out_path)
        out = self.spark.read.parquet(out_path)
        n = out.count()
        self._append(
            StageRecord(
                stage=name,
                input_fingerprint=input_fingerprint,
                out_path=out_path,
                n_rows=n,
                n_partitions=out.rdd.getNumPartitions(),
                wall_sec=time.monotonic() - t0,
                finished_at=time.time(),
            )
        )
        return out

    def partition_metrics(self, df: DataFrame, key: str = "cell_key") -> DataFrame:
        """Per-partition row counts (skew visibility) via spark_partition_id."""
        return df.groupBy(F.spark_partition_id().alias("partition")).agg(
            F.count("*").alias("n_rows")
        )


def input_fingerprint(spark: SparkSession, path: str) -> str:
    """Cheap input snapshot id: file listing + sizes + mtimes."""
    parts = []
    if os.path.isdir(path):
        for f in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, f))
            parts.append(f"{f}:{st.st_size}:{int(st.st_mtime)}")
    elif os.path.exists(path):
        st = os.stat(path)
        parts.append(f"{os.path.basename(path)}:{st.st_size}:{int(st.st_mtime)}")
    import hashlib

    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]
