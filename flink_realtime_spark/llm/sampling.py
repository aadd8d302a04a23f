"""Deterministic sampling / split / mixture operators for training-data
pipelines — NORTH-mandated extension (the reference snapshot is README-only,
/root/reference/README.md:1-2).

Design: all sampling here is HASH-based, not RNG-based. `rand()`-style
sampling is nondeterministic across retries, partitionings, and engines —
unacceptable for reproducible dataset builds (and for the driver's
value-hash oracle). Hashing a stable key gives a sample that is (a)
identical on every engine and every rerun, (b) embarrassingly parallel with
zero shuffles — a pure pushdown-able filter, (c) consistent across tables
(the same doc keeps its fate everywhere), and (d) re-weightable per stratum
by varying the modulus threshold. This is the standard technique for
100 TB-scale corpus work, where "re-run the sample" must mean "get the same
bytes".

Hash: md5 of the salted key, top 60 bits as BIGINT — bit-identical in Spark
(`conv(substr(md5(x),1,15),16,10)`) and DuckDB
(`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), the same equivalence the
SimHash operator uses (llm/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_realtime_spark.exprs import NORM_TEXT_DUCK, norm_text
from flink_realtime_spark.registry import query
from flink_realtime_spark.tables import Warehouse


def _bucket_spark(key_expr: str, salt: str, mod: int) -> F.Column:
    """Deterministic bucket in [0, mod) from a stable key — JVM-side only."""
    return F.expr(
        f"CAST(conv(substr(md5(concat(CAST({key_expr} AS STRING), ':{salt}')),"
        f" 1, 15), 16, 10) AS BIGINT) % {mod}"
    )


def _bucket_duck(key_expr: str, salt: str, mod: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || ':{salt}'),"
        f" 1, 15)) AS BIGINT) % {mod}"
    )


@query(
    "pipe_sample_hash",
    f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE {_bucket_duck('doc_id', 'sample', 20)} = 0
    """,
)
def pipe_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% corpus sample: keep documents whose hash bucket
    (mod 20) is 0. The predicate is a pure narrow filter — no shuffle, no
    RNG state, and the same rows survive on any engine, any partitioning,
    any retry. At 100 TB this runs at scan speed and composes with
    partition pruning."""
    wh = Warehouse(spark, sf_dir)
    return wh.documents.filter(
        _bucket_spark("doc_id", "sample", 20) == 0
    ).select("doc_id", "lang", "source", "n_chars")


@query(
    "pipe_split_assign",
    f"""
    SELECT
      doc_id,
      lang,
      CASE
        WHEN {_bucket_duck('doc_id', 'split', 100)} < 80 THEN 'train'
        WHEN {_bucket_duck('doc_id', 'split', 100)} < 90 THEN 'valid'
        ELSE 'test'
      END AS split
    FROM documents
    """,
)
def pipe_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test assignment by hash bucket.
    Because the split is a pure function of the document key, it is stable
    under re-runs, joins, and incremental corpus growth (new docs get a
    split; old docs never move) — the property RNG splits lack. A different
    salt ('split' vs 'sample') keeps this independent of pipe_sample_hash."""
    wh = Warehouse(spark, sf_dir)
    b = _bucket_spark("doc_id", "split", 100)
    return wh.documents.select(
        "doc_id",
        "lang",
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test").alias(
            "split"
        ),
    )


def _split_case_duck(key_expr: str) -> str:
    return (
        f"CASE WHEN {_bucket_duck(key_expr, 'split', 100)} < 80 THEN 'train'"
        f" WHEN {_bucket_duck(key_expr, 'split', 100)} < 90 THEN 'valid'"
        f" ELSE 'test' END"
    )


def _split_case_spark(key_expr: str) -> F.Column:
    b = _bucket_spark(key_expr, "split", 100)
    return (
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    )


@query(
    "pipe_split_leakage_safe",
    # Deferred f-string: COMP_CTE_DUCK imports from llm.dedup at module
    # scope below.
    None,
)
def pipe_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test split: every member of a near-dup
    cluster inherits the hash-bucket split of its cluster REPRESENTATIVE,
    so near-duplicates can never straddle the train/eval boundary — the
    failure mode of the per-document hash split (pipe_split_assign), where
    a doc and its 0.5-Jaccard twin land in train and test independently
    and the eval set silently overlaps training data. Composition of two
    existing scale-safe pieces: EXACT J≥0.5 near-dup pairs (the df-skew
    auto-routed posting/prefix-SSJoin engine, ngram_jaccard_pairs) →
    large/small star connected components (llm/dedup.py, O(log n) keyed
    rounds) → deterministic md5 bucket of rep_id (same salt as
    pipe_split_assign, so singleton docs — the overwhelming majority —
    keep exactly the split the naive assignment gave them; only clustered
    docs snap to their representative). `resplit` flags members whose
    naive split differed — a direct count of the eval-leakage the per-doc
    split would have shipped.

    The pair source must be EXACT, not banded MinHash: a leakage
    guarantee is only as strong as pair recall, and 4×4 banding misses
    ~2% of true j≈0.9 pairs (measured — the grow10 corpus tier caught
    replica pair (31240, 34368), jaccard 0.889, absent from the banded
    set; SCALE.md r07). Approximate recall is the right trade for dedup
    THROUGHPUT (llm_dedup_minhash), never for a train/eval contamination
    boundary."""
    from flink_realtime_spark.llm.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    wh = Warehouse(spark, sf_dir)
    labels = connected_components(
        wh.documents.select("doc_id"),
        ngram_jaccard_pairs(wh.documents).select("doc_a", "doc_b"),
    )
    return labels.select(
        "doc_id",
        "rep_id",
        _split_case_spark("rep_id").alias("split"),
        (_split_case_spark("doc_id") != _split_case_spark("rep_id")).alias(
            "resplit"
        ),
    )


def _install_leakage_safe_oracle() -> None:
    """Attach the recursive-CTE oracle after import (avoids importing
    llm.dedup at sampling's module top, keeping registration order — and
    the driver's pinned 50-key window — stable regardless of which module
    loads first)."""
    from flink_realtime_spark.llm.dedup import COMP_CTE_DUCK
    from flink_realtime_spark.registry import ORACLES

    ORACLES["pipe_split_leakage_safe"] = f"""
    WITH RECURSIVE
    {COMP_CTE_DUCK}
    SELECT
      doc_id,
      rep_id,
      {_split_case_duck('rep_id')} AS split,
      CAST({_split_case_duck('doc_id')} <> {_split_case_duck('rep_id')}
           AS BOOLEAN) AS resplit
    FROM comp
    """


_install_leakage_safe_oracle()


# Per-source mixture weights: up-weighted sources keep everything, the
# long tail keeps a hash-chosen quarter. Declared as data so the Spark
# plan and the oracle derive from the same table.
_MIX_KEEP_ALL = {"src0", "src1", "src2", "src3", "src4"}
_MIX_TAIL_MOD = 4  # keep 1/4 of the remaining sources


@query(
    "pipe_mixture_weighted",
    f"""
    SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars_total
    FROM documents
    WHERE source IN ({', '.join(repr(s) for s in sorted(_MIX_KEEP_ALL))})
       OR {_bucket_duck('doc_id', 'mix', _MIX_TAIL_MOD)} = 0
    GROUP BY source
    """,
)
def pipe_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixture: head sources contribute at weight 1.0, the
    tail at 0.25, selected by deterministic hash — the 'data mixing' step of
    a corpus build. The weight policy is one disjunctive filter (no union of
    N branches, no shuffle); per-source doc and char counts are the
    mixture's audit record."""
    wh = Warehouse(spark, sf_dir)
    kept = wh.documents.filter(
        F.col("source").isin(*sorted(_MIX_KEEP_ALL))
        | (_bucket_spark("doc_id", "mix", _MIX_TAIL_MOD) == 0)
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
    )


PACK_CAPACITY = 2048


@query(
    "pipe_pack_sequences",
    f"""
    SELECT
      doc_id,
      source,
      n_tokens,
      CAST((cum - n_tokens) // {PACK_CAPACITY} AS BIGINT) AS bin_id,
      CAST((cum - n_tokens) % {PACK_CAPACITY} AS BIGINT) AS bin_offset
    FROM (
      SELECT
        doc_id,
        source,
        CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
        SUM(CAST(len(str_split(text, ' ')) AS BIGINT)) OVER (
          PARTITION BY source ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING
        ) AS cum
      FROM documents
    )
    """,
)
def pipe_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing — the batch-assembly step of a
    training pipeline: documents fill 2048-token context bins per source
    stream in doc_id order; each doc gets (bin_id, bin_offset) from its
    running token offset, so any worker can compute its placement without
    coordination (docs may straddle bin boundaries — the packer's reader
    splits there). One window pass per source partition, integer-exact.
    At 100 TB: partition by (source, day) so each running sum stays within
    one shuffle partition; the assignment is reproducible at any
    parallelism because the order key is total."""
    wh = Warehouse(spark, sf_dir)
    n = F.size(F.split("text", " ")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n).over(w)
    off = cum - n
    return wh.documents.select(
        "doc_id",
        "source",
        n.alias("n_tokens"),
        (off / PACK_CAPACITY).cast("long").alias("bin_id"),
        (off % PACK_CAPACITY).cast("long").alias("bin_offset"),
    )


_STRAT_K = 25  # docs kept per language stratum


@query(
    "pipe_sample_stratified",
    f"""
    SELECT doc_id, lang, rn
    FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= {_STRAT_K}
    """,
)
def pipe_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling: exactly K docs per language, chosen by rank over
    a deterministic per-row hash (md5 of the key — engine-portable, unlike
    rand()). The class-balancing step of training-data curation. One
    shuffle on the stratum key; per-group Top-N lowers to WindowGroupLimit
    (rank pushed below the exchange), so no stratum ever sorts more than K
    rows per partition map-side."""
    from pyspark.sql import Window

    wh = Warehouse(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        wh.documents.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _STRAT_K)
    )


_CUR_MIN_WORDS = 20
_CUR_LANGS = ("de", "en", "es", "fr")
_CUR_KEEP_OF = 10  # keep 9 of 10 hash buckets in the final sample
_CUR_LANGS_SQL = ", ".join(f"'{l}'" for l in _CUR_LANGS)


@query(
    "llm_curation_pipeline",
    f"""
    WITH norm AS (
      SELECT doc_id, lang, source,
             len(string_split(text, ' ')) AS n_words,
             md5({NORM_TEXT_DUCK}) AS text_hash
      FROM documents
      WHERE lang IN ({_CUR_LANGS_SQL})
        AND len(string_split(text, ' ')) >= {_CUR_MIN_WORDS}
    ),
    dedup AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY text_hash
                                   ORDER BY doc_id) AS rn
      FROM norm
    ),
    sampled AS (
      SELECT * FROM dedup
      WHERE rn = 1 AND {_bucket_duck('doc_id', 'curate', _CUR_KEEP_OF)} <> 0
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words
    FROM sampled
    GROUP BY lang, source
    """,
)
def llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed data-curation DAG as ONE Catalyst plan — the LLM-corpus
    analog of ads_layered_pipeline's warehouse topology: language gate →
    quality gate (min word count) → exact dedup (row_number over the
    normalized-text hash) → deterministic hash downsample → per
    (lang, source) corpus stats. Everything fuses into scan → filter →
    one window shuffle → one agg shuffle; the filters sit below the
    window, so at 100 TB the dedup state only ever sees surviving docs.
    Each stage is individually oracle-checked elsewhere (llm_quality_score,
    llm_dedup_exact, pipe_sample_hash); this key checks their composition."""
    wh = Warehouse(spark, sf_dir)
    norm = (
        wh.documents.filter(F.col("lang").isin(*_CUR_LANGS))
        .select(
            "doc_id",
            "lang",
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n_words"),
            F.md5(norm_text("text")).alias("text_hash"),
        )
        .filter(F.col("n_words") >= _CUR_MIN_WORDS)
    )
    w = Window.partitionBy("text_hash").orderBy("doc_id")
    sampled = (
        norm.withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") == 1)
            & (_bucket_spark("doc_id", "curate", _CUR_KEEP_OF) != 0)
        )
    )
    return sampled.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
    )


_SHUF_SHARDS = 8


@query(
    "pipe_shuffle_shard",
    f"""
    SELECT
      doc_id,
      shuffle_rank,
      (shuffle_rank - 1) % {_SHUF_SHARDS} AS shard
    FROM (
      SELECT doc_id,
             ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':shuffle'), doc_id
             ) AS shuffle_rank
      FROM documents
    )
    """,
)
def pipe_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding for training order: rank
    every doc by a salted hash (reproducible 'random' permutation — same
    bytes every run, every engine, every partitioning) and deal ranks
    round-robin into shards, so each shard is an unbiased sample and
    inter-shard order is fixed. The global rank is the two-phase rank from
    plans/ordered.py (range-partition on the salted hash → local
    row_number → broadcast count offsets) — runs once per dataset build;
    for 100 TB use shard = hash % n directly (pipe_sample_hash's
    zero-shuffle path) when per-shard ORDER doesn't matter, this op when
    it does (curriculum or resume-from-step reproducibility)."""
    from flink_realtime_spark.plans.ordered import ordered_prefix

    wh = Warehouse(spark, sf_dir)
    base = wh.documents.select(
        "doc_id",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle"))).alias(
            "__h"
        ),
    )
    return (
        ordered_prefix(
            base, [F.col("__h"), F.col("doc_id")], pos_col="shuffle_rank"
        )
        .withColumn("shard", (F.col("shuffle_rank") - 1) % _SHUF_SHARDS)
        .drop("__h")
    )


@query(
    "pipe_dataset_card",
    """
    SELECT
      COUNT(*) AS n_docs,
      COUNT(DISTINCT lang) AS n_langs,
      COUNT(DISTINCT source) AS n_sources,
      CAST(CAST(SUM(CAST(n_chars AS DECIMAL(18,4))) AS DOUBLE)
           / COUNT(*) AS DOUBLE) AS mean_chars,
      CAST(MIN(n_chars) AS BIGINT) AS min_chars,
      CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      ROUND(CAST(quantile_cont(n_chars, 0.5) AS DOUBLE), 4) AS p50_chars,
      ROUND(CAST(quantile_cont(n_chars, 0.9) AS DOUBLE), 4) AS p90_chars
    FROM documents
    """,
)
def pipe_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: one-row corpus profile (volume, language/source
    diversity, length distribution) — the audit artifact published with
    every training-data release. Single two-phase aggregation; the exact
    interpolated percentiles switch to percentile_approx sketches at
    100 TB (agg_approx_quantile's path)."""
    wh = Warehouse(spark, sf_dir)
    return wh.documents.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        (
            F.sum(F.col("n_chars").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).cast("double").alias("mean_chars"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 4).alias("p50_chars"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 4).alias("p90_chars"),
    )


_BUDGET_TOKENS = 20000


@query(
    "pipe_token_budget",
    f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR) || ':budget') AS pri
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, n_tokens,
        SUM(n_tokens) OVER (ORDER BY pri, doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM toks
    )
    SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM ranked
    WHERE cum_tokens <= {_BUDGET_TOKENS}
    """,
)
def pipe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget fill: take documents in deterministic shuffled order
    (salted-hash priority) until the cumulative token count hits the
    budget — how a fixed-size training mix is actually drawn from a
    larger pool. Integer cumulative sum (exact), computed as the
    two-phase ordered prefix from plans/ordered.py (range-partition on
    the priority hash → per-partition running sum → broadcast prefix
    offsets) — no partition-less window."""
    from flink_realtime_spark.plans.ordered import Prefix, ordered_prefix

    wh = Warehouse(spark, sf_dir)
    toks = wh.documents.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":budget"))
        ).alias("pri"),
    )
    return (
        ordered_prefix(
            toks,
            [F.col("pri"), F.col("doc_id")],
            prefixes=[Prefix("cum_tokens", F.col("n_tokens"), "sum")],
        )
        .withColumn("cum_tokens", F.col("cum_tokens").cast("long"))
        .filter(F.col("cum_tokens") <= _BUDGET_TOKENS)
        .select("doc_id", "n_tokens", "cum_tokens")
    )


@query(
    "pipe_curriculum_ntile",
    """
    SELECT
      doc_id,
      source,
      CAST(n_chars AS BIGINT) AS n_chars,
      CAST(NTILE(4) OVER (
        PARTITION BY source ORDER BY n_chars ASC NULLS LAST, doc_id ASC
      ) AS BIGINT) AS phase
    FROM documents
    """,
)
def pipe_curriculum_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phase assignment: quartile each source's documents by
    length (short-to-long training order), deterministic via the
    (n_chars, doc_id) total order — NTILE is tie-order-dependent, so the
    unique tiebreak is what makes the phases reproducible across engines
    and partitionings. Per-source partitioned window: parallel across
    sources, never a global sort."""
    wh = Warehouse(spark, sf_dir)
    from pyspark.sql import Window

    # Explicit NULLS LAST (Spark's bare .asc() is NULLS FIRST, DuckDB's
    # bare ASC is NULLS LAST — nulls-tier find): unknown-length docs sort
    # to the end of the curriculum, with the unique doc_id tiebreak
    # keeping their phase assignment deterministic.
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").asc_nulls_last(), F.col("doc_id").asc()
    )
    return wh.documents.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.ntile(4).over(w).cast("long").alias("phase"),
    )
