"""Property checks for estimator-based operators (SURVEY.md §5.4) — the ops
whose outputs are approximate/sample-based and therefore can't be
hash-checked against a SQL oracle:

- MinHash LSH must recover the fixture's planted near-duplicate pairs (the
  25 pairs the exact trigram-Jaccard query finds at threshold 0.5),
- SimHash signatures of planted near-dups must sit at small Hamming
  distance while random pairs sit near 30/60 bits,
- IVF approximate kNN must hit a recall floor vs exact kNN while scanning
  only a fraction of the corpus,
- approx_count_distinct / HLL sketches must land within tolerance of exact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_realtime_spark import registry
from flink_realtime_spark.tables import load_table
from tests.conftest import SF_DIR

# LSH/containment mode-equivalence corpora — excluded from the fast gate (pytest.ini)
pytestmark = pytest.mark.slow


registry.load_all()


@pytest.fixture(scope="module")
def planted_pairs(spark):
    df = registry.QUERIES["llm_dedup_ngram_jaccard"](spark, SF_DIR)
    pairs = {(r.doc_a, r.doc_b) for r in df.collect()}
    assert len(pairs) >= 10, "fixture should contain planted near-dup pairs"
    return pairs


def test_ngram_mode_crossover_rule():
    """The df-skew decision function classifies every measured corpus the
    way the wall-clock measurements say it should (SCALE.md r06):
    flat-df corpora stay on the posting join at any size, skewed corpora
    switch to the prefix SSJoin once volume passes the floor."""
    from flink_realtime_spark.llm.dedup import _pick_ngram_mode

    # (cand, cand_head) measured by the --zipf/--boiler probes
    assert _pick_ngram_mode(12_657_790, 0) == "posting"  # grow10 flat
    assert _pick_ngram_mode(113_000_000, 0) == "posting"  # grow100 flat
    assert _pick_ngram_mode(2_104_614, 0.569 * 2_104_614) == "posting"  # zipf10
    assert (
        _pick_ngram_mode(117_350_535, 0.872 * 117_350_535) == "prefix"
    )  # zipf100
    assert (
        _pick_ngram_mode(20_212_117_973, 20_212_117_973) == "prefix"
    )  # boiler10


def test_ngram_jaccard_modes_identical(spark, planted_pairs):
    """The two exact ngram-jaccard plans (flat-df posting join vs
    prefix-filtered SSJoin) must emit the IDENTICAL pair set — on the
    fixture AND on a boilerplate corpus (every doc sharing a 17-word
    preamble), the df-head shape the prefix filter exists for: the
    preamble grams rank last in the global (df, gram) order and never
    enter the candidate join, yet verification against the full sets
    keeps every true pair (VERDICT r5 #3; crossover numbers in SCALE.md)."""
    from flink_realtime_spark.llm.dedup import ngram_jaccard_pairs

    docs = load_table(spark, SF_DIR, "documents")
    for corpus in (
        docs,
        docs.withColumn(
            "text",
            F.concat(
                F.lit(
                    "this document is provided as is without warranty of "
                    "any kind please retain this notice in all copies "
                ),
                F.col("text"),
            ),
        ),
    ):
        posting = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(corpus, "posting").collect()
        }
        prefix = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in ngram_jaccard_pairs(corpus, "prefix").collect()
        }
        assert posting == prefix
        assert {(a, b) for a, b, _ in posting} >= planted_pairs or corpus is not docs


def test_containment_mode_crossover_rule():
    """The exact-dup decision function routes every measured corpus the
    way the wall-clock says (tools/scale_probe.py --dedup, SCALE.md r07):
    organic corpora stay flat, k-clique dup corpora collapse."""
    from flink_realtime_spark.llm.dedup import _pick_containment_mode

    # (n_docs, dup_pairs = Σ k(k-1)) per corpus
    assert _pick_containment_mode(5_000, 0) == "flat"  # organic sf0.1
    assert _pick_containment_mode(5_000, 40) == "flat"  # a few mirrors
    assert _pick_containment_mode(50_000, 450_000) == "collapse"  # dup×10
    assert (
        _pick_containment_mode(500_000, 49_500_000) == "collapse"
    )  # dup×100


def test_containment_modes_identical(spark):
    """The flat half-space posting join and the exact-collapse route must
    emit the IDENTICAL directed pair set with identical containment
    values on a dup-planted corpus (every 7th doc replicated ×3 →
    k-clique groups on top of the organic cross pairs, plus a duplicated
    <3-word doc whose empty shingle set must emit nothing from either
    plan)."""
    from flink_realtime_spark.llm.dedup import containment_pairs

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    trip = docs.filter(F.col("doc_id") % 7 == 0)
    tiny = docs.sparkSession.createDataFrame(
        [(9_000_000, "hi there"), (9_000_001, "hi there")],
        "doc_id long, text string",
    )
    corpus = (
        docs.unionByName(trip.withColumn("doc_id", F.col("doc_id") + n))
        .unionByName(trip.withColumn("doc_id", F.col("doc_id") + 2 * n))
        .unionByName(tiny)
    )
    out = {}
    for mode in ("flat", "collapse"):
        out[mode] = {
            (r.contained_doc, r.container_doc, round(r.containment, 12))
            for r in containment_pairs(corpus, mode).collect()
        }
    assert out["flat"] == out["collapse"]
    assert len(out["flat"]) > 0
    clique = {p for p in out["flat"] if p[0] % n == p[1] % n and p[2] == 1.0}
    # every replicated doc forms a 3-clique: 6 directed pairs per group
    assert len(clique) >= 6 * trip.count()
    assert not any(p[0] >= 9_000_000 or p[1] >= 9_000_000 for p in out["flat"])


@pytest.mark.parametrize("key", ["llm_dedup_minhash", "llm_dedup_minhash_ml"])
def test_minhash_finds_planted_pairs(spark, planted_pairs, key):
    got = {
        (r.doc_a, r.doc_b)
        for r in registry.QUERIES[key](spark, SF_DIR).collect()
    }
    recall = len(planted_pairs & got) / len(planted_pairs)
    assert recall >= 0.9, f"{key} recall {recall:.2f} over planted pairs"
    # LSH candidates are verified with exact Jaccard, so no false positives
    assert got <= planted_pairs or key == "llm_dedup_minhash_ml"


def test_simhash_separates_planted_pairs(spark, planted_pairs):
    sh = {
        r.doc_id: r.simhash
        for r in registry.QUERIES["llm_dedup_simhash"](spark, SF_DIR).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    planted = [ham(sh[a], sh[b]) for a, b in planted_pairs]
    ids = sorted(sh)
    random_pairs = [
        ham(sh[ids[i]], sh[ids[(i * 37 + 11) % len(ids)]])
        for i in range(100)
        if ids[i] != ids[(i * 37 + 11) % len(ids)]
        and (ids[i], ids[(i * 37 + 11) % len(ids)]) not in planted_pairs
    ]
    avg_planted = sum(planted) / len(planted)
    avg_random = sum(random_pairs) / len(random_pairs)
    # The fixture's tiny shared vocabulary correlates ALL signatures
    # (random pairs average ~14/60 bits, and word-set-identical doc pairs
    # exist at hamming 0) — so the property is separation of the averages,
    # not absolute distances.
    assert avg_planted < 10, f"planted near-dups avg hamming {avg_planted}"
    assert avg_random > avg_planted + 5, (
        f"no separation: planted {avg_planted:.1f} vs random {avg_random:.1f}"
    )


@pytest.mark.parametrize("key", ["llm_knn_ivf", "llm_knn_ivf_hash"])
def test_ivf_recall_and_scan_fraction(spark, key):
    """Both quantizers (KMeans and the deterministic hash-seeded one)
    must hit the recall floor vs exact kNN while actually restricting
    the scan."""
    exact = registry.QUERIES["llm_knn_cosine"](spark, SF_DIR).collect()
    approx = registry.QUERIES[key](spark, SF_DIR).collect()
    exact_sets: dict[int, set] = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets: dict[int, set] = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets
    )
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    # nprobe of 16 cells on weakly clustered data — a floor, not a target
    # (measured 0.69 kmeans@nprobe4 / 0.59 hash-seeded@nprobe6 at sf0.01;
    # the deterministic index probes 6 because sampled seeds partition
    # lumpier than fitted centroids — the price of DuckDB-hashability).
    assert recall >= 0.5, f"{key} recall@5 {recall:.2f}"
    # the index must actually restrict the scan: even the nprobe largest
    # cells hold well under the full corpus (measured 0.47 kmeans top-4 /
    # 0.43 hash-seeded top-6 at sf0.01)
    from flink_realtime_spark.llm.similarity import ivf_hash_index, ivf_index
    from flink_realtime_spark.tables import Warehouse

    build, nprobe = (
        (ivf_index, 4) if key == "llm_knn_ivf" else (ivf_hash_index, 6)
    )
    assigned, _ = build(Warehouse(spark, SF_DIR).embeddings)
    n = assigned.count()
    cell_sizes = {r.cell: r.n for r in assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    worst_probe_fraction = sum(sorted(cell_sizes.values(), reverse=True)[:nprobe]) / n
    assert worst_probe_fraction < 0.6, f"{key} scans {worst_probe_fraction:.0%}"


def test_ivf_gemm_kernel_matches_join_kernel(spark):
    """ivf_topk_gemm (the large-Q per-cell matmul kernel) must return the
    same (query, neighbor) set AND the same 6-decimal sims as the
    registered llm_knn_ivf's codegen dot-product join over the same index
    — the two kernels are interchangeable implementations of one
    operator, chosen by Q (tools/ann_probe.py measures the crossover:
    88.4 s join vs 2.6 s GEMM at Q=5000, N=8000)."""
    from flink_realtime_spark.llm.similarity import (
        N_QUERIES,
        ivf_index,
        ivf_topk_gemm,
    )
    from flink_realtime_spark.tables import Warehouse

    assigned, centroids = ivf_index(Warehouse(spark, SF_DIR).embeddings)
    assigned = assigned.localCheckpoint(eager=True)  # one KMeans fit
    gemm = {
        (r.query_id, r.neighbor_id): (r.rank, r.cos_sim)
        for r in ivf_topk_gemm(assigned, centroids, N_QUERIES).collect()
    }
    # re-derive the join-kernel result from the SAME assignment (the
    # registered key would refit KMeans; seed makes it identical, but
    # sharing `assigned` removes even that coupling from the assertion)
    from pyspark.sql import Window
    from flink_realtime_spark.llm.similarity import K, cosine_expr

    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("csim", cosine_expr("qe", "centroid"))
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= 4)
        .select("query_id", "qe", "cell")
    )
    cand = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("ne"), "cell"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    join_form = {
        (r.query_id, r.neighbor_id): (r.rank, r.cos_sim)
        for r in probes.join(cand, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_expr("qe", "ne"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= K)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("sim", 6).alias("cos_sim"),
        )
        .collect()
    }
    # Tie-aware comparison (the ann_probe.py discipline): the two kernels
    # sum dot products in different float orders, so near-tied sims at the
    # top-k boundary may legally swap ranks k/k+1. Exact set/rank equality
    # would go flaky the day the embeddings fixture gains near-ties.
    EPS = 1e-6
    for pair in set(gemm) & set(join_form):
        grank, gsim = gemm[pair]
        jrank, jsim = join_form[pair]
        assert abs(gsim - jsim) < 1e-9, (pair, gemm[pair], join_form[pair])
        if grank != jrank:
            lo, hi = min(grank, jrank), max(grank, jrank)
            between = [
                s
                for (qq, _), (r, s) in join_form.items()
                if qq == pair[0] and lo <= r <= hi
            ]
            assert all(abs(s - gsim) <= EPS for s in between), (
                pair, gemm[pair], join_form[pair], between,
            )
    for pair in set(gemm) ^ set(join_form):
        src = gemm if pair in gemm else join_form
        other = join_form if pair in gemm else gemm
        _, sim = src[pair]
        boundary = min(
            s for (qq, _), (_, s) in other.items() if qq == pair[0]
        )
        assert abs(sim - boundary) <= EPS, (pair, sim, boundary)


def test_approx_distinct_tolerance(spark):
    # The key now emits the tolerance VERDICT itself (exact count + one
    # boolean per estimator); independently recheck the exact side against
    # agg_count_distinct and require every estimator verdict to hold.
    rows = registry.QUERIES["agg_approx_distinct"](spark, SF_DIR).collect()
    exact = {
        r.o_orderpriority: r.uniq_cust
        for r in registry.QUERIES["agg_count_distinct"](spark, SF_DIR).collect()
    }
    assert {r.o_orderpriority for r in rows} == set(exact)
    for r in rows:
        assert r.exact_uniq_cust == exact[r.o_orderpriority]
        assert r.approx_ok and r.hll_ok, r


def test_uv_sketch_rollup_tolerance(spark):
    rows = registry.QUERIES["agg_uv_sketch_rollup"](spark, SF_DIR).collect()
    exact_df = (
        load_table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("week", F.date_trunc("day", "ts")).alias("week"))
        .agg(F.countDistinct("user_id").alias("uv"))
    )
    exact = {r.week: r.uv for r in exact_df.collect()}
    assert {r.week for r in rows} == set(exact)
    for r in rows:
        assert r.uv_exact == exact[r.week]
        assert r.sketch_ok, r  # merged daily sketches within 5% of exact


def test_two_stage_dedup_equals_cluster_on_dup_corpus(spark, tmp_path):
    """The fixture has no exact duplicates, so the oracle can't exercise
    the collapse stage; this builds a 3x-replicated corpus (every doc an
    exact-dup triple) and asserts the two-stage composition produces the
    SAME cluster assignment as the single-stage minhash+CC pipeline."""
    import os
    import shutil

    from flink_realtime_spark.tables import TABLE_NAMES

    d = str(tmp_path / "dup3")
    os.makedirs(d, exist_ok=True)
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(3).select(F.col("id").alias("rep"))
    (
        docs.crossJoin(reps)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * n)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(d, "documents.parquet"))
    )
    for name in TABLE_NAMES:
        dst = os.path.join(d, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(f"{SF_DIR}/{name}.parquet", dst)

    cols = ["doc_id", "rep_id", "cluster_size", "is_canonical"]
    two = sorted(
        tuple(r)
        for r in registry.QUERIES["llm_dedup_two_stage"](spark, d)
        .select(*cols)
        .collect()
    )
    one = sorted(
        tuple(r)
        for r in registry.QUERIES["llm_dedup_cluster"](spark, d)
        .select(*cols)
        .collect()
    )
    assert two == one
    # the replicas must actually have merged: every cluster ≥ 3 members
    assert all(size >= 3 for _, _, size, _ in two)
    shutil.rmtree(d, ignore_errors=True)
