"""Scale-up probe: replicate the sf0.1 fact tables k× (key-offset so keys
stay unique and FKs intact), run headline queries at each size, and print
the runtime curve. Evidence that the plans scale linearly rather than
degrading (broadcast dims stay broadcast, partial agg keeps shuffle volume
flat, AQE picks sane partition counts) — the local[32] stand-in for the
1000-executor claim in SCALE.md.

Usage: python tools/scale_probe.py [k ...]   (default 1 4 10)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_realtime_spark import registry
from flink_realtime_spark.session import get_spark
from flink_realtime_spark.tables import TABLE_NAMES, load_table

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_scale"


def build(spark, k: int) -> str:
    out = f"{WORK}/x{k}"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)
    li = load_table(spark, SRC, "lineitem")
    od = load_table(spark, SRC, "orders")
    ev = load_table(spark, SRC, "events")
    n_ord = od.agg(F.max("o_orderkey")).collect()[0][0] + 1
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    reps = spark.range(k).select(F.col("id").alias("rep"))
    (
        od.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * n_ord)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "orders.parquet"))
    )
    (
        li.crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * n_ord)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "lineitem.parquet"))
    )
    (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * n_ev)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "events.parquet"))
    )
    for name in TABLE_NAMES:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    open(os.path.join(out, "_OK"), "w").close()
    return out


def build_dup_docs(spark, k: int) -> str:
    """documents replicated k× with IDENTICAL text (doc_id offset) — the
    duplicate-heavy crawl shape (mirrors/reposts) dedup must survive:
    every doc becomes a k-clique of exact dups, so candidate pairs grow
    k(k-1)/2 per group and cluster sizes hit k."""
    out = f"{WORK}/dup{k}"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, SRC, "documents")
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(k).select(F.col("id").alias("rep"))
    (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n_doc)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    for name in TABLE_NAMES:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    open(os.path.join(out, "_OK"), "w").close()
    return out


def build_distinct_docs(spark, k: int) -> str:
    """documents grown k× with DISTINCT text: every word in replica r is
    tagged ``word_r``, so replicas share no shingles (vocabulary scales
    k×, zero cross-replica near-dup pairs). This is the corpus-GROWTH
    shape — more unique content — as opposed to build_dup_docs's
    duplicate-heavy shape; together they bracket what a crawl does."""
    out = f"{WORK}/grow{k}"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)
    docs = load_table(spark, SRC, "documents")
    n_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(k).select(F.col("id").alias("rep"))
    (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n_doc)
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit("_"), F.col("rep")),
                ),
                " ",
            ),
        )
        .drop("rep")
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    for name in TABLE_NAMES:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    open(os.path.join(out, "_OK"), "w").close()
    return out


def build_vec_embeddings(spark, k: int) -> str:
    """embeddings grown k× with DISTINCT deterministic vectors (the
    grow100 pattern on the VECTOR axis — VERDICT r7 #4): replica r of
    vector v keeps v's label but scales each dimension by a
    position-and-replica-keyed factor in [0.8, 1.2], so directions (and
    hence cosine neighborhoods, centroids, quantization codes) all
    change per replica while magnitudes stay in the fixture's range.
    Integer-hash-driven (no rand()) and baked into the parquet at build
    time, so both engines read identical float32 bits — cross-engine
    arithmetic enters only in the queries, which is what the tier
    sweeps. k=100 → 200k vectors × 64 dims."""
    out = f"{WORK}/vec{k}"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)
    emb = load_table(spark, SRC, "embeddings")
    n_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    reps = spark.range(k).select(F.col("id").alias("rep"))
    scaled = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x, i: x
        * (
            F.lit(0.8)
            + F.lit(0.4)
            * (
                F.pmod(F.col("rep") * 8191 + i * 127, F.lit(97)).cast(
                    "double"
                )
                / F.lit(96.0)
            )
        ),
    )
    (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * n_vec)
        .withColumn("embedding", scaled.cast("array<float>"))
        .drop("rep")
        .repartition(16)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "embeddings.parquet"))
    )
    for name in TABLE_NAMES:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    open(os.path.join(out, "_OK"), "w").close()
    return out


# The nulls tier's injection spec: per table, the PK columns that seed
# the deterministic draw, then {column: null-percent}. Every fixture
# table is 100% non-null (verified r08), so the engines' null semantics
# — Spark's ASC=NULLS FIRST vs DuckDB's ASC=NULLS LAST sort default,
# NULL group keys, null-skipping AVG/SUM, null join keys, NULL <=> vs =
# — had never been hash-swept before this tier. Injection targets are
# nullable ATTRIBUTES; PKs and event-time stay non-null (id/ts quality
# is ingest-enforced in a real pipeline, documented trade), FKs get a
# lighter 2% (null FK rows exercise join drop/outer-null paths).
NULL_SPEC = {
    "lineitem": (
        ["l_orderkey", "l_linenumber"],
        {
            "l_quantity": 5, "l_extendedprice": 5, "l_discount": 5,
            "l_tax": 5, "l_returnflag": 5, "l_linestatus": 5,
            "l_shipdate": 5,
        },
    ),
    "orders": (
        ["o_orderkey"],
        {
            "o_orderstatus": 5, "o_totalprice": 5, "o_orderdate": 5,
            "o_orderpriority": 5, "o_custkey": 2,
        },
    ),
    "events": (
        ["event_id"],
        {"event_type": 5, "value": 5, "props": 5, "user_id": 2},
    ),
    "documents": (
        ["doc_id"],
        {"lang": 5, "source": 5, "n_chars": 5, "text": 2},
    ),
    "embeddings": (["vec_id"], {"label": 5, "embedding": 2}),
    "customer": (["c_custkey"], {"c_acctbal": 5, "c_mktsegment": 5}),
}

# Hash draws are blind to operator-level "magic" row ranges: the r08 run
# happened to null NO embedding with vec_id < 20, so the knn keys' QUERY
# vectors (vec_id < N_QUERIES = 20) never went null and the
# null-query-vector path in llm_knn_* was never tier-exercised (ADVICE
# r8). Force specific pk values null per column so the interesting rows
# are guaranteed, independent of the draw: vec_id 7 (a knn query vector)
# and 3 low doc_ids (inside every llm_* doc-range filter).
FORCE_NULL = {
    "embeddings": {"embedding": [7]},
    "documents": {"text": [11, 205, 1003]},
}


def build_null_facts(spark) -> str:
    """sf0.1 tables with DETERMINISTIC NULLs injected per NULL_SPEC:
    column c of a row nulls out when pmod(xxhash64(pk..., 'c'), 100) <
    pct — independent per column, reproducible, baked into the parquet
    so both engines read identical bytes. This is the NULL-SEMANTICS
    axis (r08): 100 TB of crawl/telemetry data is never fully non-null,
    and sort/group/agg/join null behavior differs between engines in
    ways a null-free fixture can never surface."""
    out = f"{WORK}/nulls"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)
    for name, (pk, cols) in NULL_SPEC.items():
        df = load_table(spark, SRC, name)
        forced = FORCE_NULL.get(name, {})
        for c, pct in cols.items():
            draw = F.pmod(
                F.xxhash64(*[F.col(p) for p in pk], F.lit(c)), F.lit(100)
            )
            cond = draw < pct
            if c in forced:
                cond = cond | F.col(pk[0]).isin(forced[c])
            df = df.withColumn(
                c, F.when(cond, F.lit(None)).otherwise(F.col(c))
            )
        df.write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    for name in TABLE_NAMES:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    open(os.path.join(out, "_OK"), "w").close()
    return out


# The uni tier's injection spec (r09, VERDICT r8 #1): every fixture string
# is 100% ASCII, so eight rounds of strict hashes never executed either
# engine's non-ASCII paths — case folding, regex character classes,
# multi-byte code-point offsets, CJK no-whitespace tokenization, NFC/NFD,
# astral-plane (surrogate-pair) handling, JSON unicode serialization.
# Deterministic per-doc rewrite, baked into parquet, so both engines read
# identical bytes. Body words are REPLACED (not just framed) so the
# unicode flows through shingles, token counts, case folds and regexes —
# each replacement mines a known engine-divergence shaft:
UNI_WORD_MAP = [
    ("value", "valüé"),          # accented Latin, NFC
    ("table", "táble"),    # combining mark (NFD 'á') — NFC/NFD pair
    ("spark", "Σπαρκ"),          # Greek, mixed case (final-sigma rules)
    ("query", "ЗАПРОС"),         # Cyrillic UPPERCASE (lower() path)
    ("window", "ウィンドウ"),      # Katakana
    ("stream", "流水線"),          # CJK, no internal whitespace
    ("batch", "Straße"),         # sharp-s (upper() 1:1-vs-full casing)
    ("filter", "🚀🧪"),           # astral-plane emoji (surrogate pairs)
]
UNI_SEGMENTS = [
    "İstanbul ŉgram ǅungla ﬁnal",   # dotted İ, U+0149, titlecase ǅ, fi ligature
    "Ἀθῆναι ᾈσμα σίγμα τέλοΣ ς",    # polytonic Greek, final/medial sigma
    "العربية نصّ مُرَكَّب",           # RTL Arabic with harakat
    "한국어 텍스트 처리 규칙",          # Hangul
    "ẞß SS ss İ ı I i",             # the full Turkic/German casing mine
    "👩‍👩‍👧‍👦 🇺🇸 🇦🇶 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𠀀𠀁",   # ZWJ family, flags, math alphanumerics
    "été été",          # same word NFD vs NFC
    "ΜΆΪΟΣ μάϊος Ǆǅǆ non breaking zero​width",  # + NBSP/ZWSP-glued tokens:
    # U+00A0 and U+200B are NOT \s in Java or RE2 (both ASCII-only), so
    # whitespace collapse and word splits must treat each glued pair as
    # ONE token on both engines — never executed before this tier.
]
# The NFD forms are source-encoded as raw combining marks; guard them
# against a future editor/formatter silently NFC-normalizing the file.
assert "́" in UNI_WORD_MAP[1][1], "NFD 'table' repl was normalized"
assert UNI_SEGMENTS[6].count("́") == 2, "NFD segment was normalized"


def build_unicode_docs(spark) -> str:
    """sf0.1 tables with DETERMINISTIC multilingual text injected: ~25% of
    documents get their common body words swapped for the UNI_WORD_MAP
    forms plus a UNI_SEGMENTS frame (picked by doc_id hash), ~3% become
    CJK-punctuated no-whitespace strings (the tokenizer edge), ~10% of
    sources gain a unicode prefix (non-ASCII GROUP/sort keys), and ~10% of
    events.props gain a unicode key/value pair (JSON parse/serialize over
    non-ASCII). This is the UNICODE axis: 100 TB of crawl data is never
    pure ASCII, and casing/regex/code-point-offset behavior differs
    between engines in ways an ASCII fixture can never surface."""
    out = f"{WORK}/uni"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)

    # PAIR-COHERENT rewrite draws: the fixture's LSH-vs-exact-oracle
    # equality rests on every near-dup pair sitting at jaccard >= 0.8
    # (llm/dedup.py FIXTURE DEPENDENCY). An independent per-doc draw
    # rewrites ONE member of ~37% of pairs, dropping their jaccard into
    # the no-recall-guarantee zone [0.5, 0.8) — the first uni sweep
    # measured 4 such LSH-missed pairs. So members of a near-dup
    # component must transform IDENTICALLY: compute the base corpus's
    # exact trigram-jaccard pairs at a conservative 0.25 threshold
    # (the base corpus is margin-gapped — measured 256 pairs, all
    # >= 0.8, none in [0.25, 0.8)), union-find them into components,
    # and key every text draw off the component ANCHOR (min doc_id).
    # Identical word-maps + identical frames keep intra-pair jaccard at
    # its base margin; cross-component docs sharing a frame gain ~3 of
    # ~40+ shingles (j ~ 0.04), far below threshold.
    import duckdb as _duckdb

    _con = _duckdb.connect()
    _pairs = _con.sql(
        r"""
        WITH ws AS MATERIALIZED (
          SELECT doc_id,
                 str_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
          FROM read_parquet('"""
        + SRC
        + r"""/documents.parquet')
        ),
        s AS MATERIALIZED (
          SELECT doc_id,
            CASE WHEN len(w) >= 3 THEN
              list_distinct(list_transform(generate_series(1, len(w) - 2),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
            ELSE [] END AS sh
          FROM ws
        ),
        u AS (SELECT doc_id, unnest(sh) AS g FROM s),
        shr AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
          FROM u a JOIN u b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        sz AS (SELECT doc_id, len(sh) AS n FROM s WHERE len(sh) > 0)
        SELECT c.doc_a, c.doc_b
        FROM shr c JOIN sz sa ON sa.doc_id = c.doc_a
                   JOIN sz sb ON sb.doc_id = c.doc_b
        WHERE c.shared >= 0.25 * (sa.n + sb.n - c.shared)
        """
    ).fetchall()
    parent: dict = {}

    def _find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    members: set = set()
    for a, b in _pairs:
        members.update((a, b))
        ra, rb = _find(a), _find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    anchor_rows = [(d, _find(d)) for d in members]
    anchors = spark.createDataFrame(
        anchor_rows or [(-1, -1)], "doc_id BIGINT, anchor BIGINT"
    )

    # Paired docs keep a NULL-able anchor flag: the word map alone is a
    # token bijection (trigram-shingle bijection → jaccard EXACTLY
    # preserved), while the segment frame adds unshared end-boundary
    # shingles to truncation-style near-dups (measured: an 0.80-margin
    # pair slides to ~0.78, back under the LSH guarantee). So paired docs
    # get word maps only; frames and the CJK no-whitespace treatment
    # apply to singletons.
    docs = (
        load_table(spark, SRC, "documents")
        .join(F.broadcast(anchors), "doc_id", "left")
    )
    paired = F.col("anchor").isNotNull()
    akey = F.coalesce("anchor", F.col("doc_id"))
    draw = F.pmod(F.xxhash64(akey, F.lit("uni")), F.lit(100))
    body = F.col("text")
    for word, repl in UNI_WORD_MAP:
        body = F.replace(body, F.lit(word), F.lit(repl))
    seg = F.element_at(
        F.array(*[F.lit(s) for s in UNI_SEGMENTS]),
        (F.pmod(F.xxhash64(akey, F.lit("uniseg")), F.lit(8)) + 1).cast(
            "int"
        ),
    )
    docs = docs.withColumn(
        "text",
        F.when(draw < 25, F.when(paired, body).otherwise(
            F.concat(seg, F.lit(" "), body, F.lit(" "), seg)
        ))
        .when(
            (draw >= 25) & (draw < 28) & ~paired,
            F.replace(F.col("text"), F.lit(" "), F.lit("、")),
        )
        .otherwise(F.col("text")),
    ).drop("anchor").withColumn(
        "source",
        F.when(
            F.pmod(F.xxhash64("doc_id", F.lit("unisource")), F.lit(100)) < 10,
            F.concat(F.lit("srç№"), F.col("source")),
        ).otherwise(F.col("source")),
    )
    docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    ev = load_table(spark, SRC, "events")
    edraw = F.pmod(F.xxhash64("event_id", F.lit("uni")), F.lit(100))
    ev = ev.withColumn(
        "props",
        F.when(
            edraw < 10,
            F.concat(
                F.substring(
                    F.col("props"), F.lit(1), F.length("props") - F.lit(1)
                ),
                F.lit(', "étiqueta": "día 🌞"}'),
            ),
        ).otherwise(F.col("props")),
    )
    ev.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    for name in TABLE_NAMES:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    open(os.path.join(out, "_OK"), "w").close()
    return out


# The specials tier's injection spec (r10, VERDICT r9 #2): no fixture
# double ever held NaN/±Inf/-0.0/subnormal, so nine rounds of strict
# hashes never executed either engine's special-value paths — NaN-largest
# sort order, NaN=NaN grouping, IEEE propagation through sums vs the
# DECIMAL-exact path (which can't represent specials at all), ROUND /
# floor / to_json / percentile of non-finite input, signed-zero
# formatting. Deterministic per-row draw baked into parquet so both
# engines read identical bits. Injection targets are the MEASUREMENT
# domains (telemetry value, money-shaped attributes, embeddings);
# the five kinds spread evenly over the 2% draw window.
SPECIAL_VALUES = (float("nan"), float("inf"), float("-inf"), -0.0, 5e-324)
# float32 variants for the embedding column (min denormal float32; the
# double 5e-324 would flush to zero under the array<float> round-trip)
SPECIAL_VALUES_F32 = (
    float("nan"), float("inf"), float("-inf"), -0.0, 1.401298464324817e-45,
)
SPECIAL_SPEC = {
    "lineitem": (
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ),
    "orders": (["o_orderkey"], ["o_totalprice"]),
    "events": (["event_id"], ["value"]),
    "customer": (["c_custkey"], ["c_acctbal"]),
}
# Hash draws are blind to operator-level magic row ranges (the FORCE_NULL
# lesson): pin specials into two knn QUERY vectors (vec_id < N_QUERIES)
# so the null-query... special-query path is guaranteed exercised.
FORCE_SPECIAL_VEC = {3: (5, 0), 13: (7, 1)}  # vec_id: (dim, kind index)


def build_special_facts(spark) -> str:
    """sf0.1 tables with DETERMINISTIC IEEE specials injected per
    SPECIAL_SPEC: column c of a row goes special when
    pmod(xxhash64(pk..., c, 'special'), 1000) < 20 (2%), the kind chosen
    by draw % 5 — NaN, +Inf, -Inf, -0.0, min-subnormal. embeddings get a
    lighter per-ELEMENT draw (0.5%) plus the FORCE_SPECIAL_VEC pins.
    100 TB of telemetry always carries the garbage floats upstream float
    math produces; sort/group/agg/round behavior over them differs
    between engines in ways a specials-free fixture can never surface."""
    out = f"{WORK}/specials"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)
    kinds = F.array(*[F.lit(v) for v in SPECIAL_VALUES])
    for name, (pk, cols) in SPECIAL_SPEC.items():
        df = load_table(spark, SRC, name)
        for c in cols:
            draw = F.pmod(
                F.xxhash64(*[F.col(p) for p in pk], F.lit(c), F.lit("special")),
                F.lit(1000),
            )
            df = df.withColumn(
                c,
                F.when(
                    draw < 20,
                    F.element_at(kinds, (F.pmod(draw, F.lit(5)) + 1).cast("int")),
                ).otherwise(F.col(c)),
            )
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))

    kinds32 = F.array(*[F.lit(v) for v in SPECIAL_VALUES_F32])
    emb = load_table(spark, SRC, "embeddings")

    def elem(x, i):
        draw = F.pmod(
            F.xxhash64(F.col("vec_id"), i, F.lit("special")), F.lit(1000)
        )
        kind = F.pmod(draw, F.lit(5))
        cond = draw < 5
        for vid, (dim, kidx) in FORCE_SPECIAL_VEC.items():
            hit = (F.col("vec_id") == vid) & (i == dim)
            cond = cond | hit
            kind = F.when(hit, F.lit(kidx)).otherwise(kind)
        return F.when(
            cond, F.element_at(kinds32, (kind + 1).cast("int"))
        ).otherwise(x)

    emb = emb.withColumn(
        "embedding",
        F.transform(F.col("embedding").cast("array<double>"), elem).cast(
            "array<float>"
        ),
    )
    emb.write.mode("overwrite").parquet(os.path.join(out, "embeddings.parquet"))

    for name in TABLE_NAMES:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    open(os.path.join(out, "_OK"), "w").close()
    return out


DEGENERATE_PK = {
    "region": "r_regionkey", "nation": "n_nationkey",
    "customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
    "orders": "o_orderkey", "lineitem": "l_orderkey",
    "events": "event_id", "documents": "doc_id", "embeddings": "vec_id",
}


def build_degenerate(spark, kind: str) -> str:
    """Degenerate-shape fixtures (r09, VERDICT r8 #4): the classic hiding
    places for reduce-on-empty, schema-of-empty and percentile-on-one-row
    divergences. ``kind='empty'`` writes every table with ZERO rows (same
    schema — Spark still emits a schema-bearing part file, so both
    engines' scans agree); ``kind='one'`` keeps exactly the min-pk row of
    each table (deterministic; FKs may dangle — that's the point, joins
    must degrade to empty not crash)."""
    assert kind in ("empty", "one")
    out = f"{WORK}/{kind}"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)
    for name in TABLE_NAMES:
        df = load_table(spark, "/root/testdata/sf0.001", name)
        if kind == "empty":
            df = df.limit(0)
        else:
            df = df.orderBy(DEGENERATE_PK[name]).limit(1)
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    open(os.path.join(out, "_OK"), "w").close()
    return out


# The extremes tier's injection spec (r10, the DOMAIN-BOUNDARY axis):
# every fixture value lives in a benign band — events.value >= 0,
# quantities in [1, 50], discounts in [0, 0.1], event time confined to
# one month of 2024, order/ship dates to 1995-2001, doc texts <= 553
# ASCII chars, props always '{"k": <small int>}' — so ten rounds of
# strict hashes never executed either engine's boundary paths: negative
# measures (sign/abs/sqrt/log/guard branches), epoch-NEGATIVE and
# parquet-nanos-boundary timestamps (floor-vs-truncate bucket division
# only diverges below 1970), leap-day and century dates, megabyte
# documents, zero-length / whitespace-only / control-character (incl.
# NUL) text, and adversarial JSON (int64 overflow, double overflow,
# duplicate keys, type switches, malformed fragments). 100 TB of
# telemetry + crawl data carries ALL of these; probes (this file's
# design session) confirmed the engines genuinely differ here — DuckDB
# ERRORS on malformed-JSON extraction, sqrt/ln of negatives, and casts
# that Spark NULLs or NaNs, DuckDB's yyjson re-stringifies >uint64
# integers through double while Spark returns the raw literal, and
# duplicate-key extraction is first-match vs last-match.
EXTREME_TS = (
    "1677-09-22 00:12:44",  # just inside parquet-nanos MIN (epoch < 0)
    "2262-04-10 23:47:16",  # just inside parquet-nanos MAX
    "2000-02-29 12:34:56.789012",  # leap day, sub-second µs
    "1900-01-01 00:00:00",  # century non-leap year, epoch < 0
)
EXTREME_DATE = (
    "1677-09-22 00:00:00",
    "2262-04-10 00:00:00",
    "2000-02-29 00:00:00",
    "1900-02-28 00:00:00",
)
# money/measure magnitudes: the largest value whose per-row
# DECIMAL(18,4) exactness cast still fits (|x| < 1e14), a 17-sig-digit
# repr-boundary value, and a sub-quantum positive that rounds to 0.0000
EXTREME_MONEY = (9.9e12, -9.9e12, 123456789.0001, 1e-12)
EXTREME_RATE = (1.5, -0.5, 0.9999, 1e-12)  # discount/tax beyond [0, 0.1]
EXTREME_PROPS = (
    '{"k": 9223372036854775807}',   # int64 max (exact in both engines?)
    '{"k": -9223372036854775808}',  # int64 min
    '{"k": 18446744073709551616}',  # 2^64 — beyond any integer type
    '{"k": 1.7976931348623157e308}',  # double max
    '{"k": 1e309}',                 # overflows double (Infinity)
    '{"k": 0.30000000000000004}',   # shortest-repr boundary double
    '{"k": 3.7}',                   # fractional ≥ .5: truncate-vs-round
    '{"k": -2.5}',                  # negative half: trunc -2 vs half-even -2
    '{"k": "42"}',                  # type switch: string-valued k
    '{"k": [1, 2, 3]}',             # type switch: array-valued k
    '{"k": 2, "k": 3}',             # DUPLICATE key (first- vs last-wins)
    '{"k": 5',                      # malformed (truncated) JSON
)
# Forced doc replacements (the FORCE_NULL lesson: draws are blind to
# magic rows, so the interesting shapes are pinned). All ids verified
# near-dup-SINGLETONS in the base corpus (trigram-jaccard >= 0.25
# members recomputed at build time) so whole-text replacement cannot
# perturb an LSH-vs-exact pair; replacement vocab ('zq####') is
# disjoint from the fixture's English words, so new pairs can't form.
EXTREME_DOC_IDS = {
    "mega": 16,        # ~1 MB, 140k words, newline every 12 words
    "giant_word": 923,  # 100k chars, no whitespace at all
    "control": 1531,   # tab/CR/LF/NUL/US/VT/FF/DEL between letters
    "empty": 2048,     # zero-length text ('' is not NULL)
    "ws_only": 2049,   # whitespace-only text
    "self_rep": 3777,  # one 2-word phrase repeated 3500×
    "punct": 4444,     # punctuation/digit tokens, no letters
}


def _extreme_doc_texts() -> dict:
    """Deterministic replacement texts (pure-Python LCG, no RNG state)."""
    words = []
    x = 4242
    for _ in range(140_000):
        x = (1103515245 * x + 12345) % (1 << 31)
        words.append("zq%04d" % (x % 9999))
    mega = "\n".join(
        " ".join(words[i : i + 12]) for i in range(0, len(words), 12)
    )
    giant = "zqg" + "abcdefghij" * 9_997 + "end"  # 100,006 chars, 1 token
    control = "ctl\ta\rb\nc\x00d\x1fe\x0bf\x0cg\x7fh " * 40
    return {
        EXTREME_DOC_IDS["mega"]: mega,
        EXTREME_DOC_IDS["giant_word"]: giant,
        EXTREME_DOC_IDS["control"]: control,
        EXTREME_DOC_IDS["empty"]: "",
        EXTREME_DOC_IDS["ws_only"]: " \t\r\n  ",
        EXTREME_DOC_IDS["self_rep"]: "zqrep zqalpha " * 3500,
        EXTREME_DOC_IDS["punct"]: "!!! ??? ... ;;; ::: --- %%% $$$ @@@ ### 12 34",
    }


def build_extreme_facts(spark) -> str:
    """sf0.1 tables with DETERMINISTIC domain-boundary values injected per
    the EXTREME_* specs above: per (pk, column, salt) xxhash64 draws pick
    ~0.5% of timestamps/dates/magnitudes, ~1% negations and adversarial
    props, all baked into parquet so both engines read identical bytes;
    seven forced document replacements carry the text shapes. This is
    the DOMAIN-BOUNDARY axis — the never-executed-path class that made
    the nulls (18 finds), uni (11) and specials (27) tiers pay."""
    out = f"{WORK}/extremes"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)

    def draw(pk_cols, salt, mod):
        return F.pmod(
            F.xxhash64(*[F.col(p) for p in pk_cols], F.lit(salt)), F.lit(mod)
        )

    def pick(kinds_col, d, n):
        return F.element_at(kinds_col, (F.pmod(d, F.lit(n)) + 1).cast("int"))

    def inj_ts(df, pk, col, kinds, rate_per_mille=5):
        dtype = dict(df.dtypes)[col]
        arr = F.array(
            *[F.to_timestamp(F.lit(s)).cast(dtype) for s in kinds]
        )
        d = draw(pk, f"x_{col}", 1000)
        return df.withColumn(
            col,
            F.when(d < rate_per_mille, pick(arr, d, len(kinds))).otherwise(
                F.col(col)
            ),
        )

    def inj_mag(df, pk, col, kinds, neg=True):
        arr = F.array(*[F.lit(v) for v in kinds])
        d = draw(pk, f"xmag_{col}", 1000)
        out_col = F.when(d < 5, pick(arr, d, len(kinds))).otherwise(
            F.col(col)
        )
        if neg:
            nd = draw(pk, f"xneg_{col}", 100)
            out_col = F.when((d >= 5) & (nd < 1), -F.col(col)).otherwise(
                out_col
            )
        return df.withColumn(col, out_col)

    ev = load_table(spark, SRC, "events")
    ev = inj_ts(ev, ["event_id"], "ts", EXTREME_TS)
    ev = inj_mag(ev, ["event_id"], "value", EXTREME_MONEY)
    parr = F.array(*[F.lit(s) for s in EXTREME_PROPS])
    pd_ = draw(["event_id"], "xprops", 1000)
    ev = ev.withColumn(
        "props",
        F.when(pd_ < 10, pick(parr, pd_, len(EXTREME_PROPS))).otherwise(
            F.col("props")
        ),
    )
    ev.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    li = load_table(spark, SRC, "lineitem")
    lpk = ["l_orderkey", "l_linenumber"]
    li = inj_ts(li, lpk, "l_shipdate", EXTREME_DATE)
    li = inj_mag(li, lpk, "l_quantity", EXTREME_MONEY)
    li = inj_mag(li, lpk, "l_extendedprice", EXTREME_MONEY)
    li = inj_mag(li, lpk, "l_discount", EXTREME_RATE, neg=False)
    li = inj_mag(li, lpk, "l_tax", EXTREME_RATE, neg=False)
    li.write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))

    od = load_table(spark, SRC, "orders")
    od = inj_ts(od, ["o_orderkey"], "o_orderdate", EXTREME_DATE)
    od = inj_mag(od, ["o_orderkey"], "o_totalprice", EXTREME_MONEY)
    od.write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))

    cu = load_table(spark, SRC, "customer")
    cu = inj_mag(cu, ["c_custkey"], "c_acctbal", EXTREME_MONEY, neg=False)
    cu.write.mode("overwrite").parquet(os.path.join(out, "customer.parquet"))

    # Forced doc replacements — re-verify the singleton precondition
    # against the live base corpus before substituting (the uni builder's
    # pair-coherence lesson: an LSH-vs-exact pair must never lose one
    # member to a rewrite).
    import duckdb as _duckdb

    mem = {
        r[0]
        for r in _duckdb.sql(
            r"""
            WITH ws AS MATERIALIZED (
              SELECT doc_id, str_split(lower(trim(regexp_replace(
                         text, '\s+', ' ', 'g'))), ' ') AS w
              FROM read_parquet('"""
            + SRC
            + r"""/documents.parquet')),
            s AS MATERIALIZED (
              SELECT doc_id, CASE WHEN len(w) >= 3 THEN
                list_distinct(list_transform(generate_series(1, len(w)-2),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              ELSE [] END AS sh FROM ws),
            u AS (SELECT doc_id, unnest(sh) AS g FROM s),
            shr AS (SELECT a.doc_id da, b.doc_id db, COUNT(*) shared
                    FROM u a JOIN u b ON a.g = b.g AND a.doc_id < b.doc_id
                    GROUP BY 1, 2),
            sz AS (SELECT doc_id, len(sh) n FROM s WHERE len(sh) > 0),
            hits AS (SELECT da, db FROM shr c
                     JOIN sz sa ON sa.doc_id = c.da
                     JOIN sz sb ON sb.doc_id = c.db
                     WHERE c.shared >= 0.25 * (sa.n + sb.n - c.shared))
            SELECT da FROM hits UNION SELECT db FROM hits
            """
        ).fetchall()
    }
    texts = _extreme_doc_texts()
    clash = sorted(set(texts) & mem)
    assert not clash, f"extreme doc ids are near-dup members: {clash}"
    repl = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id BIGINT, xtext STRING"
    )
    docs = (
        load_table(spark, SRC, "documents")
        .join(F.broadcast(repl), "doc_id", "left")
        .withColumn("text", F.coalesce("xtext", "text"))
        .withColumn("n_chars", F.length("text").cast("bigint"))
        .drop("xtext")
    )
    docs.write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    for name in TABLE_NAMES:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    open(os.path.join(out, "_OK"), "w").close()
    return out


def build_zipf_docs(spark, k: int) -> str:
    """documents REGENERATED (not replicated) with a ZIPFIAN word
    distribution at k× the sf0.1 count — the natural-language df shape the
    fixture lacks (its shingle df is flat at ~9.6; VERDICT r5 #3). Word
    ranks come from the closed-form inverse CDF of Zipf s=1 over a
    Heaps-law vocabulary (V = 20000·√k): u uniform from a doc/pos hash,
    rank = ceil(exp(u·ln V)) gives P(rank ≤ x) = ln x / ln V, i.e.
    density ∝ 1/rank — so stopword-shingle posting lists now have a
    genuine head that grows with the corpus. Every 200th doc also gets a
    planted near-dup (last five words dropped) so threshold-0.5 survivor
    pairs exist. Fully deterministic (hash-driven, no rand())."""
    import math as _math

    out = f"{WORK}/zipf{k}"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)
    n_docs = 5000 * k
    vocab = int(20000 * _math.sqrt(k))
    ln_v = float(_math.log(vocab))
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    n_words = F.pmod(F.xxhash64("doc_id"), F.lit(40)) + F.lit(40)
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda p: F.concat(
            F.lit("w"),
            F.least(
                F.lit(vocab),
                F.ceil(
                    F.exp(
                        (
                            F.pmod(
                                F.xxhash64(F.col("doc_id"), p),
                                F.lit(1_000_000),
                            )
                            / F.lit(1_000_000.0)
                        )
                        * F.lit(ln_v)
                    )
                ),
            ).cast("long"),
        ),
    )
    docs = base.withColumn("text", F.array_join(words, " "))
    dups = (
        docs.filter(F.col("doc_id") % 200 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(n_docs))
        .withColumn(
            "text",
            F.array_join(
                F.slice(
                    F.split("text", " "),
                    F.lit(1),
                    F.greatest(F.size(F.split("text", " ")) - 5, F.lit(3)),
                ),
                " ",
            ),
        )
    )
    (
        docs.unionByName(dups)
        .select(
            "doc_id",
            "text",
            F.lit("en").alias("lang"),
            F.lit("zipf_synth").alias("source"),
            F.length("text").alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    for name in TABLE_NAMES:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    open(os.path.join(out, "_OK"), "w").close()
    return out


_BOILER = (
    "this document is provided as is without warranty of any kind "
    "please retain this notice in all copies"
)


def build_boiler_docs(spark, k: int) -> str:
    """The Zipf corpus with a SHARED 17-word boilerplate preamble on every
    doc — the crawl shape that actually kills the posting join: ~15
    preamble trigrams each have df = n_docs, so candidate volume is
    ~15·n²/2 pairs that ALL fail verification (the preamble alone never
    reaches J ≥ 0.5 against 40-80 content words). The prefix filter
    excludes exactly those grams (highest df → never in the rarest-half
    prefix) while provably keeping every true pair."""
    out = f"{WORK}/boiler{k}"
    if os.path.exists(os.path.join(out, "_OK")):
        return out
    os.makedirs(out, exist_ok=True)
    src = build_zipf_docs(spark, k)
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    (
        docs.withColumn("text", F.concat(F.lit(_BOILER + " "), F.col("text")))
        .withColumn("n_chars", F.length("text"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )
    for name in TABLE_NAMES:
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SRC, f"{name}.parquet"), dst)
    open(os.path.join(out, "_OK"), "w").close()
    return out


def zipf_probe(spark, ks, builder=None) -> None:
    """The df-skew crossover measurement (VERDICT r5 #3): on each Zipf
    corpus run BOTH exact ngram-jaccard plans, print candidate volume per
    doc, walls, and assert the pair sets are IDENTICAL (probe outputs are
    data); llm_dedup_minhash for reference. The numbers set
    _SSJOIN_CROSSOVER_CAND_PER_DOC in llm/dedup.py."""
    from flink_realtime_spark.llm.dedup import (
        _with_shingles,
        ngram_jaccard_pairs,
    )

    builder = builder or build_zipf_docs
    for k in ks:
        sf_dir = builder(spark, k)
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        sh = _with_shingles(docs.select("doc_id", "text")).select(
            "doc_id", "sh"
        )
        postings = sh.select("doc_id", F.explode("sh").alias("g"))
        n_docs = docs.count()
        row = (
            postings.groupBy("g")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(
                (F.sum(F.col("df") * (F.col("df") - 1)) / 2).alias("cand"),
                F.max("df").alias("max_df"),
                F.count(F.lit(1)).alias("n_grams"),
                F.sum("df").alias("n_postings"),
            )
            .collect()[0]
        )
        cand_per_doc = 2.0 * float(row["cand"]) / n_docs
        print(
            f"zipf×{k}: {n_docs} docs, {row['n_postings']} postings over "
            f"{row['n_grams']} grams (max df {row['max_df']}), "
            f"candidates/doc {cand_per_doc:,.0f}"
        )
        results = {}
        for mode in ("posting", "prefix"):
            if mode == "posting" and row["cand"] > 2e9:
                # the point of the probe at this k: the posting join's own
                # candidate volume IS the explosion — don't run a 2B+-row
                # pair shuffle just to time it failing
                print(
                    f"zipf×{k} posting  SKIPPED "
                    f"({row['cand']:,.0f} predicted candidate rows)"
                )
                continue
            t0 = time.perf_counter()
            pairs = ngram_jaccard_pairs(docs, mode)
            got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
            dt = time.perf_counter() - t0
            results[mode] = got
            print(f"zipf×{k} {mode:8s} {dt:7.2f}s  ({len(got)} pairs)")
        if "posting" in results:
            assert results["posting"] == results["prefix"], (
                f"zipf×{k}: plans disagree — "
                f"{len(results['posting'] - results['prefix'])} only-posting, "
                f"{len(results['prefix'] - results['posting'])} only-prefix"
            )
        else:
            assert len(results["prefix"]) >= n_docs // 200, (
                "prefix plan lost planted near-dup pairs"
            )
        t0 = time.perf_counter()
        n_mh = registry.QUERIES["llm_dedup_minhash"](spark, sf_dir).count()
        print(
            f"zipf×{k} minhash  {time.perf_counter() - t0:7.2f}s  "
            f"({n_mh} pairs, banded reference)"
        )


def _release(spark) -> None:
    """Drop accumulated JVM state between probe keys: localCheckpoint
    blocks and broadcast pieces from a finished key linger until their
    Python DataFrames are GC'd AND the ContextCleaner runs — in a shared
    8g local JVM, 10+ corpus-scale keys of leftovers eventually tip a
    later key's broadcast build into notEnoughMemoryToBuildAndBroadcast
    (the key alone re-runs fine in a fresh session — instrument state,
    not an operator bug; measured r06b on grow100 ngram-jaccard)."""
    import gc

    gc.collect()  # drop pyspark refs so the cleaner sees dead RDDs
    spark.sparkContext._jvm.System.gc()


def corpus_scale(spark, ks) -> None:
    """Corpus-growth curve for the LLM family: wall time per key at k×
    DISTINCT corpus size. Near-linear growth = the posting/banding plans
    scale with content volume; super-linear growth would mean a pairwise
    blow-up hiding somewhere."""
    for k in ks:
        sf_dir = SRC if k == 1 else build_distinct_docs(spark, k)
        for key in _CORPUS_KEYS:
            t0 = time.perf_counter()
            n = registry.QUERIES[key](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            print(f"grow×{k:<3} {key:<24} {dt:6.2f}s  ({n} out rows)")
            _release(spark)


_CORPUS_KEYS = (
    "llm_dedup_exact",
    "llm_dedup_minhash",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_containment",  # r06c: shares the posting-join growth shape
    "llm_dup_gram_share",
    "llm_dedup_substring",
    "llm_text_stats",
)


def ingest_stress(spark, k: int, n_batches: int) -> None:
    """Per-batch cost curve of the continuous dedup ingest (MinhashIndex):
    a k×-grown distinct corpus arrives in n_batches; the question is how
    per-batch wall grows as the index accumulates. The within-batch work
    is constant; only the batch-vs-index band join and the verification
    reads scale with the index, so the curve should rise gently and
    sub-linearly — a super-linear bend would mean index scans are doing
    corpus×corpus work."""
    import shutil as _sh
    import tempfile

    from flink_realtime_spark.llm.dedup import MinhashIndex

    sf_dir = SRC if k == 1 else build_distinct_docs(spark, k)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    work = tempfile.mkdtemp(prefix="mh_ingest_")
    idx = MinhashIndex(spark, os.path.join(work, "idx"))
    total_pairs = 0
    for b in range(n_batches):
        batch = docs.filter(
            (F.col("doc_id") >= b * n / n_batches)
            & (F.col("doc_id") < (b + 1) * n / n_batches)
        )
        t0 = time.perf_counter()
        total_pairs += idx.update(batch).count()
        dt = time.perf_counter() - t0
        print(
            f"ingest×{k} batch {b + 1}/{n_batches}: {dt:6.2f}s "
            f"(cumulative pairs {total_pairs})"
        )
    _sh.rmtree(work, ignore_errors=True)


def dedup_stress(spark, ks) -> None:
    for k in ks:
        sf_dir = SRC if k == 1 else build_dup_docs(spark, k)
        keys = [
            "llm_dedup_exact",
            "llm_dedup_minhash",
            "llm_dedup_cluster",
            "llm_dedup_two_stage",
            "llm_dedup_substring",
            # r07: containment routes dup-heavy corpora in-operator
            # (exact-collapse → representatives → expand; containment_pairs
            # "auto"), so it runs this tier at every k — the r06 flat plan
            # emitted k²·|sh| candidate gram rows per clique (25.6 s at
            # dup×10; >10 min at dup×100, where the collapse route answers
            # in seconds; numbers in SCALE.md r07).
            "llm_dedup_containment",
        ]
        for key in keys:
            t0 = time.perf_counter()
            df = registry.QUERIES[key](spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            print(f"dup×{k:<3} {key:<20} {dt:6.2f}s  ({n} out rows)")
            _release(spark)


def main() -> None:
    if "--ingest" in sys.argv:
        sys.argv.remove("--ingest")
        args = [int(a) for a in sys.argv[1:]]
        k = args[0] if args else 4
        n_batches = args[1] if len(args) > 1 else 8
        registry.load_all()
        spark = get_spark("scale-probe-ingest")
        registry.QUERIES["llm_dedup_minhash"](spark, SRC).count()  # warm
        ingest_stress(spark, k, n_batches)
        spark.stop()
        return
    if "--zipf" in sys.argv or "--boiler" in sys.argv:
        boiler = "--boiler" in sys.argv
        sys.argv = [a for a in sys.argv if a not in ("--zipf", "--boiler")]
        ks = [int(a) for a in sys.argv[1:]] or ([10] if boiler else [10, 100])
        registry.load_all()
        spark = get_spark("scale-probe-zipf")
        registry.QUERIES["llm_dedup_ngram_jaccard"](spark, SRC).count()  # warm
        zipf_probe(spark, ks, builder=build_boiler_docs if boiler else None)
        spark.stop()
        return
    if "--corpus" in sys.argv:
        sys.argv.remove("--corpus")
        ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
        registry.load_all()
        spark = get_spark("scale-probe-corpus")
        registry.QUERIES["llm_dedup_minhash"](spark, SRC).count()  # warm
        corpus_scale(spark, ks)
        spark.stop()
        return
    if "--dedup" in sys.argv:
        sys.argv.remove("--dedup")
        ks = [int(a) for a in sys.argv[1:]] or [1, 5, 10]
        registry.load_all()
        spark = get_spark("scale-probe-dedup")
        registry.QUERIES["llm_dedup_exact"](spark, SRC).count()  # warm
        dedup_stress(spark, ks)
        spark.stop()
        return
    if "--spill" in sys.argv:
        # Memory-pressure probe: the ×100 curves above run on the default
        # 8g driver heap where little spills; this mode re-runs the
        # shuffle-heaviest keys at ×100 under a DELIBERATELY small heap
        # (default 3g, SPARK_GRAFT_SPILL_MEM overrides) with the UI
        # enabled, then REST-reads per-stage memory/disk spill counters —
        # evidence the plans DEGRADE GRACEFULLY (complete correctly,
        # spill to disk, no OOM) when executor memory is under-provisioned,
        # which is the failure mode a 100 TB cluster actually meets.
        # Builds its own session: get_spark pins ui.enabled=false and the
        # heap must be set before JVM launch.
        import json as _json
        import urllib.request

        sys.argv.remove("--spill")
        ks = [int(a) for a in sys.argv[1:]] or [100]
        mem = os.environ.get("SPARK_GRAFT_SPILL_MEM", "3g")
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("scale-probe-spill")
            .config("spark.driver.memory", mem)
            .config("spark.ui.enabled", "true")
            .config("spark.sql.shuffle.partitions", "32")
            .getOrCreate()
        )
        registry.load_all()

        def spilled() -> tuple[int, int]:
            base = spark.sparkContext.uiWebUrl
            apps = _json.load(
                urllib.request.urlopen(f"{base}/api/v1/applications")
            )
            mem_b = disk_b = 0
            for st in _json.load(
                urllib.request.urlopen(
                    f"{base}/api/v1/applications/{apps[0]['id']}/stages"
                )
            ):
                mem_b += st.get("memoryBytesSpilled", 0)
                disk_b += st.get("diskBytesSpilled", 0)
            return mem_b, disk_b

        for k in ks:
            fact_dir = SRC if k == 1 else build(spark, k)
            doc_dir = SRC if k == 1 else build_distinct_docs(spark, k)
            for key, sf_dir in (
                ("agg_star_flagship", fact_dir),
                ("sort_multi_key", fact_dir),
                ("win_late_drop", fact_dir),
                ("llm_dedup_minhash", doc_dir),
            ):
                m0, d0 = spilled()
                t0 = time.perf_counter()
                n = registry.QUERIES[key](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                m1, d1 = spilled()
                print(
                    f"spill×{k:<3} heap={mem} {key:<20} {dt:6.2f}s  "
                    f"({n} rows; spilled mem {(m1 - m0) / 1e9:.2f} GB, "
                    f"disk {(d1 - d0) / 1e9:.2f} GB)",
                    flush=True,
                )
        spark.stop()
        return
    if "--graph" in sys.argv:
        # ×k decade curve for the ITERATIVE family (round-5 extension of
        # the ×100 probes): large-star/small-star connected components
        # (llm_dedup_cluster / llm_dedup_two_stage) and 10-round PageRank
        # (graph_pagerank) over the grown DISTINCT corpus — node count
        # scales k×, per-replica edge structure is preserved (replicas
        # share no shingles), so this measures how O(log n)-round
        # iteration and the per-round checkpoint cadence absorb a bigger
        # graph, not a denser one (the dup-heavy density shape is
        # --dedup's job).
        sys.argv.remove("--graph")
        ks = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
        registry.load_all()
        spark = get_spark("scale-probe-graph")
        registry.QUERIES["llm_dedup_exact"](spark, SRC).count()  # warm
        for k in ks:
            sf_dir = SRC if k == 1 else build_distinct_docs(spark, k)
            for key in (
                "llm_dedup_cluster",
                "llm_dedup_two_stage",
                "graph_pagerank",
            ):
                t0 = time.perf_counter()
                n = registry.QUERIES[key](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                print(
                    f"grow×{k:<3} {key:<22} {dt:6.2f}s  ({n} out rows)",
                    flush=True,
                )
        spark.stop()
        return
    if "--ordered" in sys.argv:
        # ×k curve for the two-phase global-order machinery itself
        # (plans/ordered.py — the engine's global-order workhorse): one
        # prefix-MAX over the FULL events relation (win_late_drop) and
        # one global ranked sort over a filtered orders relation
        # (sort_multi_key). The claim under test: wall grows ~linearly
        # because the only full-relation costs are the range exchange
        # (which ANY global order pays) + one hash exchange, while the
        # summary/broadcast side stays #partitions-sized at every k.
        sys.argv.remove("--ordered")
        ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
        registry.load_all()
        spark = get_spark("scale-probe-ordered")
        registry.QUERIES["win_late_drop"](spark, SRC).count()  # warm
        for k in ks:
            sf_dir = SRC if k == 1 else build(spark, k)
            spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
            for key, base_rows in (
                ("win_late_drop", 100_000),
                ("sort_multi_key", 600_000),
            ):
                t0 = time.perf_counter()
                n = registry.QUERIES[key](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                print(
                    f"x{k:<3} {key:<22} {dt:6.2f}s  "
                    f"{base_rows * k / dt / 1e6:5.1f}M rows/s  ({n} out rows)"
                )
        spark.stop()
        return
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 10]
    registry.load_all()
    spark = get_spark("scale-probe")
    # warm codegen/broadcast machinery off the clock
    registry.QUERIES["agg_star_flagship"](spark, SRC).count()
    registry.QUERIES["win_tumble"](spark, SRC).count()
    for k in ks:
        sf_dir = SRC if k == 1 else build(spark, k)
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
        for key in (
            "agg_star_flagship",
            "agg_groupby_basic",
            "win_tumble",
            # round-3 reworked event-table keys: the bounded-explode
            # stickiness join and the two-phase-prefix refire board must
            # scale with event volume, not degrade
            "ads_stickiness_dau_wau",
            "win_late_refire",
        ):
            t0 = time.perf_counter()
            n = registry.QUERIES[key](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            rows = (600_000 if key.startswith("agg") else 100_000) * k
            print(
                f"x{k:<3} {key:<22} {dt:6.2f}s  "
                f"{rows / dt / 1e6:5.1f}M rows/s  ({n} out rows)"
            )
    spark.stop()


if __name__ == "__main__":
    main()
