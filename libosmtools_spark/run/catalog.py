"""Table sinks: Iceberg when a catalog is on the classpath, parquet
otherwise (S11's serialization sinks as durable tables; SURVEY.md §7 hard
part (f)).

The production target is an Iceberg table partitioned by cell-key prefix so
Iceberg partition pruning serves the spatial equi-join (SURVEY.md §4
"spatial partition pruning").  This sandbox has no Iceberg jars, so
``write_table``/``read_table`` probe the writeTo V2 API and fall back to
partitioned parquet with identical layout semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libosmtools_spark.geom.kernels import _IY_SHIFT


def cell_prefix_col(key_col: str = "cell_key", prefix_bits: int = 8):
    """Coarse spatial partition value: the top bits of (iy, ix) — adjacent
    cells share prefixes, so range queries prune partitions."""
    return F.shiftright(F.col(key_col), _IY_SHIFT + 19).cast("int").alias("cell_prefix")


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def write_table(
    df: DataFrame,
    name: str,
    root: str,
    partition_by: str | None = "cell_prefix",
) -> str:
    """Idempotent table write.  Iceberg (`writeTo(...).createOrReplace()`)
    when available; else overwrite parquet partitioned identically.
    Returns the path/identifier written."""
    spark = df.sparkSession
    if partition_by == "cell_prefix" and "cell_key" in df.columns:
        df = df.withColumn("cell_prefix", cell_prefix_col())
    if iceberg_available(spark):
        writer = df.writeTo(name).using("iceberg")
        if partition_by and partition_by in df.columns:
            writer = writer.partitionedBy(F.col(partition_by))
        writer.createOrReplace()
        return name
    path = os.path.join(root, name)
    w = df.write.mode("overwrite")
    if partition_by and partition_by in df.columns:
        w = w.partitionBy(partition_by)
    w.parquet(path)
    return path


def read_table(spark: SparkSession, name: str, root: str) -> DataFrame:
    if iceberg_available(spark):
        try:
            return spark.read.table(name)
        except Exception:  # noqa: BLE001
            pass
    return spark.read.parquet(os.path.join(root, name))
