"""Lookup (dimension) join for streams — the Flink lookup-join analog.

Reference capability: Flink SQL lookup joins (`FOR SYSTEM_TIME AS OF
proc_time`) resolve each fact record against the CURRENT version of a
dimension table in a KV store (HBase/Redis) — the signature enrichment step
of the ODS→DWD layer (provenance FLINK/ARCH; the snapshot is README-only,
/root/reference/README.md:1-2).

Spark-first mapping: Structured Streaming's stream–static join binds the
static side once per query start, so a dimension that CHANGES during the
stream's lifetime needs the foreachBatch form below — each micro-batch
re-reads the dimension snapshot (explicit schema, no inference) and
broadcast-joins it, which is exactly the "per-batch snapshot" consistency
Flink's lookup join with cache TTL ≈ trigger interval provides. Event-time
versioned enrichment (join the dim version valid at EVENT time, not
processing time) is the separate as-of join (plans/asof.py).

Scale notes (100 TB): the dim re-read costs one small-table scan per
micro-batch — negligible against a broadcast that saves shuffling the fact
stream. Dims beyond broadcast size should instead be compacted into the
stream as a CDC changelog and joined stateful-side (cdc_latest_image), the
same trade Flink makes between lookup joins and temporal-table joins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_join_per_batch(
    stream_df: DataFrame,
    dim_path: str,
    dim_schema: str,
    on: Callable[[DataFrame, DataFrame], F.Column],
    sink: Callable[[DataFrame, int], None],
    how: str = "inner",
):
    """Enrich a stream against a per-micro-batch refreshed dim snapshot.

    ``on(batch_df, dim_df)`` builds the join condition; ``sink(joined,
    batch_id)`` receives each enriched micro-batch (write idempotently —
    foreachBatch may retry). Returns the DataStreamWriter, caller adds
    trigger/checkpoint and start()s."""

    def _fb(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        dim = spark.read.schema(dim_schema).parquet(dim_path)
        joined = batch_df.join(F.broadcast(dim), on(batch_df, dim), how)
        sink(joined, batch_id)

    return stream_df.writeStream.foreachBatch(_fb)
