"""Physical layout strategies for warehouse layers — SCALE.md made concrete.

The ARCH layers (DWD/DWS/ADS) are materialized as parquet datasets whose
layout is chosen for the downstream read pattern:

- ``write_partitioned_layer``: hive-style partition directories on a
  low-cardinality column (date, event_type). Readers filtering on the
  partition column scan only matching directories (static partition
  pruning — zero IO for pruned partitions, visible as PartitionFilters in
  the scan node).
- ``write_bucketed_table``: pre-shuffled bucketed layout on a join/agg key.
  Two tables bucketed on the same key with the same bucket count join with
  NO exchange on either side — at 100 TB this turns the nightly
  fact-to-fact join from the dominant shuffle into a local zip.
  (Bucketing requires the table catalog: saveAsTable, not plain paths.)

tests/test_layout.py asserts both properties against the actual plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_layer(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def read_layer(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_layer(
    spark: SparkSession, path: str, target_files: int, order_cols: list[str] | None = None
) -> None:
    """Small-file compaction (the OPTIMIZE pass every streaming sink needs:
    micro-batches write a file per trigger per partition, and a month of
    5-minute triggers is ~10k files whose open/footer cost dominates reads).
    Rewrites the dataset into ``target_files`` files, optionally
    sort-within-partition on the hot filter/join key so row-group min/max
    pruning works on point lookups. The compacted output is written to a
    sibling directory on the same filesystem so the final swap is two true
    renames (original aside, compacted in) — the source dataset is never
    deleted until the new copy is in place, so a crash at any point leaves
    at least one complete copy next to ``path``. On a real lake this is
    Delta/Iceberg OPTIMIZE or a partition-scoped rewrite job."""
    import os
    import shutil

    df = spark.read.parquet(path)
    out = df.coalesce(target_files)
    if order_cols:
        out = df.repartition(target_files).sortWithinPartitions(*order_cols)
    norm = path.rstrip("/")
    tmp = norm + ".compact_tmp"
    old = norm + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(old, ignore_errors=True)
    os.rename(norm, old)
    try:
        os.rename(tmp, norm)
    except OSError:
        os.rename(old, norm)  # roll back: the original is still intact
        raise
    shutil.rmtree(old)
