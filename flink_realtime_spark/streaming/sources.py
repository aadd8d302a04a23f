"""Streaming sources — SURVEY.md §2.1.

Reference capability: Flink KafkaSource JSON ingest into the ODS layer,
plus socket debug input (provenance FLINK/ARCH/NORTH; snapshot is
README-only, /root/reference/README.md:1-2). Spark-first: ``readStream``
builders. Kafka/socket builders construct the real plans (the Kafka
connector jar and a broker aren't in this container, so they are exercised
only up to plan construction); the replayable file source is the test-time
stand-in, and the same transformations bind to any of them — Structured
Streaming's unified DataFrame API is the whole point.

Scale notes (100 TB): Kafka ingest parallelism = topic partitions; set
minPartitions to fan out hot topics. File-source backfills use
maxFilesPerTrigger to bound micro-batch size. Never infer schema on a
stream — both builders take explicit DDL.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from flink_realtime_spark.registry import query
from flink_realtime_spark.session import prepare
from flink_realtime_spark.tables import Warehouse

EVENTS_DDL = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, "
    "event_type STRING, value DOUBLE, props STRING"
)

# Batch-ingest twin of EVENTS_DDL: the driver-facing surface carries
# wall-clock TIMESTAMP_NTZ event time (tables.normalize_event_ts, r10
# non-UTC contract); text-format ingest declares the same type so a
# roundtrip reproduces load_table's schema exactly.
EVENTS_DDL_NTZ = EVENTS_DDL.replace("ts TIMESTAMP", "ts TIMESTAMP_NTZ")

# JSON timestamp patterns for Kafka payloads: the to_json/from_json default
# is millisecond precision, which silently truncates µs event times on the
# producer AND consumer side — pin a microsecond pattern on both. NTZ
# columns (the batch surface's wall-clock event time, r10) use their own
# option/pattern — no zone offset to print.
JSON_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
JSON_TS_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
JSON_TS_OPTS = {
    "timestampFormat": JSON_TS_FMT,
    "timestampNTZFormat": JSON_TS_NTZ_FMT,
}


def kafka_json_source(
    spark: SparkSession,
    brokers: str,
    topic: str,
    schema_ddl: str,
    starting_offsets: str = "latest",
    min_partitions: int | None = None,
) -> DataFrame:
    """Kafka JSON-event source (Flink KafkaSource analog): value bytes →
    from_json with an explicit schema; offsets tracked by the checkpoint.
    Returns an unbounded DataFrame; not executable in this container (no
    broker/connector jar) but the plan is the production ingest path."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if min_partitions:
        reader = reader.option("minPartitions", str(min_partitions))
    raw = reader.load()
    return raw.select(
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(
            F.col("value").cast("string"),
            schema_ddl,
            JSON_TS_OPTS,
        ).alias("j"),
    ).select("kafka_ts", "j.*")


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Socket debug source (one text line per row)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


def file_stream_source(
    spark: SparkSession,
    directory: str,
    schema: str | StructType,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Replayable file (parquet) source — the bounded stand-in used by every
    streaming test; semantically identical plans bind to Kafka in prod."""
    reader = spark.readStream.format("parquet").schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(directory)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table replayed as a stream. The file stores
    TIMESTAMP(NANOS); declaring ``ts TIMESTAMP`` makes the scan itself
    truncate to µs (exact for this fixture — no sub-µs components).
    Streams MUST keep instant TIMESTAMP: Spark's watermark machinery
    rejects TIMESTAMP_NTZ outright (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE),
    so the r10 wall-clock NTZ contract applies to the BATCH surface the
    driver hashes (EVENTS_DDL_NTZ below is the batch-ingest twin); the
    stream-exec keys are rows-only by design and their collected values
    agree with the batch twins on a UTC host.

    The fixture stores events.parquet as a single FILE, selected via
    pathGlobFilter; a Spark-written table (the scale-probe ×k replicas) is
    a DIRECTORY of part files whose NAMES don't match that glob — the
    stream then sees zero files and an availableNow replay commits no
    batch at all (found by the ×10 at-scale sweep: STDS errors / empty
    smoke output). Directories stream directly, without the name filter."""
    import os

    prepare(spark)
    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):
        return file_stream_source(spark, path, EVENTS_DDL)
    return file_stream_source(spark, sf_dir, EVENTS_DDL, glob="events.parquet")


def run_available_now(sdf: DataFrame, output_mode: str = "append") -> DataFrame:
    """Execute a streaming DataFrame to completion over currently available
    input (trigger availableNow) into a memory sink; return the bounded
    result. This is how streaming operators expose themselves to the batch
    oracle."""
    name = f"mem_{uuid.uuid4().hex[:10]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)


@query("src_stream_smoke")
def src_stream_smoke(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Structured Streaming smoke: replay events through the file
    source with a watermark + tumbling-window count, availableNow trigger,
    memory sink. No SQL oracle (execution-path check; the window semantics
    themselves are oracle-checked by win_tumble and the equivalence suite)."""
    wh = Warehouse(spark, sf_dir)  # noqa: F841 — pins session confs
    sdf = events_stream(spark, sf_dir)
    agg = (
        sdf.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
        )
    )
    return run_available_now(agg, output_mode="append")


def rate_source(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int | None = None
) -> DataFrame:
    """Rate source (columns: timestamp, value) — the load-generator stream
    for soak/throughput tests, and the stand-in Flink's datagen connector
    fills. Unbounded; pair with a processing-time trigger and stop
    condition in tests."""
    prepare(spark)
    reader = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
    )
    if num_partitions:
        reader = reader.option("numPartitions", str(num_partitions))
    return reader.load()
