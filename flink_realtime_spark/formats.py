"""Multi-format bounded IO — CSV / JSON-lines / ORC with explicit schemas.

Reference capability: Flink's FileSystem connector formats (csv, json, orc,
parquet) on both batch and streaming file sources (provenance FLINK/ARCH;
snapshot is README-only, /root/reference/README.md:1-2). Parquet is the
engine's native layer format (tables.py); these helpers cover the ingest
boundary where upstream drops text-format files.

Rules (100 TB posture):
- NEVER infer schemas: inference reads the data twice and is
  nondeterministic across file orderings; every reader takes explicit DDL.
- CSV/JSON are row-oriented and splittable only line-wise — fine for
  ingest, wrong for layers: always land them into parquet/ORC before joins
  (columnar pruning + pushdown only exist there).
- The same DDL drives spark.readStream for the streaming form
  (streaming/sources.file_stream_source accepts any format's schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_realtime_spark.session import prepare


def write_text_format(df: DataFrame, path: str, fmt: str, **options) -> None:
    """Land a DataFrame as csv/json/orc files (one layer handoff)."""
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt in ("csv", "json"):
        # Timestamps round-trip only with an explicit pattern incl. micros
        # (both text writers default to millisecond precision). NTZ
        # columns read their own option (timestampNTZFormat) — the r10
        # wall-clock event-time contract makes ts NTZ, so pin both.
        options.setdefault("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        options.setdefault("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read_text_format(
    spark: SparkSession, path: str, fmt: str, schema_ddl: str, **options
) -> DataFrame:
    """Read csv/json/orc with an explicit schema (no inference, ever)."""
    prepare(spark)
    r = spark.read.format(fmt).schema(schema_ddl)
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt in ("csv", "json"):
        options.setdefault("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        options.setdefault("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Media-file ingest via the built-in ``binaryFile`` source — the entry
    point of the multimodal pipeline (llm/multimodal.py): each file becomes
    one row (path, modificationTime, length, content BINARY), ready to join
    with typed metadata and flow through the mapInPandas decode plumbing.

    100 TB posture: binary files are NOT splittable — parallelism is one
    task per file, so shard media into object-store prefixes and let the
    file listing distribute; land decoded features into parquet rather than
    re-reading media per query. ``glob`` (e.g. ``*.jpg``) prunes at listing
    time, before any bytes move."""
    prepare(spark)
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    if recursive:
        r = r.option("recursiveFileLookup", "true")
    return r.load(path)
