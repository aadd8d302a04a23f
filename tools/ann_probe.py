"""ANN scale probe: does the IVF path hold when Q grows with N?

llm_knn_cosine (exact, broadcast query side) is the documented small-Q
baseline; the claim to prove is that the IVF index keeps its bounded scan
fraction and recall when the query side stops being small — the all-vs-all
regime (self-join dedup, full-corpus link prediction). This probe:

1. builds a corpus of N = 2000·k vectors from the sf0.1 embeddings fixture
   (vec_id-offset replicas with a deterministic per-replica perturbation so
   copies are near but not identical — the crawl-shard shape);
2. fits ONE IVF index (16 cells, nprobe 4) over it;
3. for Q ∈ {20, 500, 5000} queries, measures
   - scan fraction: candidate pairs scanned / (Q·N) — must stay ≈
     nprobe/ncells regardless of Q,
   - recall@5 vs the exact top-5, computed on a 200-query sample (exact
     reference restricted to sampled queries: the probe's own cost must
     not be all-pairs),
   - wall time of the IVF top-k itself.

Results land in SCALE.md ("ANN at growing Q"). Usage:
    python tools/ann_probe.py [k] [ncells] [nprobe]
(default k=4; ncells/nprobe default to the registered keys' OWN
corpus-adaptive derivation — `ivf_geometry(N, 4)`, 16 cells / nprobe 4
at fixture decades, rescaled past 200k vectors since 16 cells at 2M
vectors means 125k-vector cells and GEMM blocks that outgrow a worker
(r09 find; r10 moved the derivation in-operator). Pass ncells/nprobe
explicitly to measure an alternative geometry. N_SAMPLE via
SPARK_GRAFT_ANN_SAMPLE; Q list via SPARK_GRAFT_ANN_QS;
SPARK_GRAFT_ANN_SKIP_JOIN=1 skips the per-pair join kernel — at the 2M
decade it pays the full scan-fraction per-pair cost by design (1273 s
at Q=500) and the probe's question there is the INDEX's recall/scan
floors plus the GEMM wall, not the known-slow kernel.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_realtime_spark.llm.similarity import (
    K,
    cosine_expr,
    ivf_geometry,
    ivf_index,
    ivf_topk_gemm,
)
from flink_realtime_spark.session import get_spark
from flink_realtime_spark.tables import load_table

SRC = "/root/testdata/sf0.1"
N_SAMPLE = int(os.environ.get("SPARK_GRAFT_ANN_SAMPLE", "200"))
NPROBE = 4  # overridden by argv[3]


def build_corpus(spark, k: int):
    emb = load_table(spark, SRC, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    reps = spark.range(k).select(F.col("id").alias("rep"))
    # Deterministic per-(replica, vec) jitter (±0.05/dim): replicas are
    # NEAR-duplicates, not exact copies, so recall against them is a real
    # test rather than trivially cos=1 self-matches.
    jitter = (
        F.pmod(F.xxhash64(F.col("vec_id"), F.col("rep")), F.lit(1000)).cast(
            "double"
        )
        / 10000.0
        - 0.05
    )
    out = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * n).alias("vec_id"),
            F.when(F.col("rep") == 0, F.col("embedding"))
            .otherwise(
                F.transform(F.col("embedding"), lambda v: v + jitter)
            )
            .alias("embedding"),
        )
    )
    return out, n * k


def ivf_topk(assigned, centroids, q_max: int):
    q = assigned.filter(F.col("vec_id") < q_max).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cell").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("csim", cosine_expr("qe", "centroid"))
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= NPROBE)
        .select("query_id", "qe", "cell")
    )
    cand = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("ne"), "cell"
    )
    pairs = probes.join(cand, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    topk = (
        pairs.withColumn("sim", cosine_expr("qe", "ne"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("cos_sim"))
    )
    return topk, pairs


def exact_topk_sampled(assigned, sample_ids):
    q = assigned.filter(F.col("vec_id").isin(sample_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    cand = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("emb").alias("ne")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        F.broadcast(q)
        .crossJoin(cand)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_expr("qe", "ne"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "neighbor_id")
    )


def main() -> None:
    global NPROBE
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ncells = int(sys.argv[2]) if len(sys.argv) > 2 else None
    if len(sys.argv) > 3:
        NPROBE = int(sys.argv[3])
    skip_join = os.environ.get("SPARK_GRAFT_ANN_SKIP_JOIN") == "1"
    spark = get_spark("ann-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    corpus, n = build_corpus(spark, k)
    corpus = corpus.localCheckpoint(eager=True)
    if ncells is None:
        # the registered keys' own derivation (scan fraction held)
        ncells, derived_nprobe = ivf_geometry(n, NPROBE)
        if len(sys.argv) <= 3:
            NPROBE = derived_nprobe
    assigned, centroids = ivf_index(corpus, n_cells=ncells)
    assigned = assigned.localCheckpoint(eager=True)
    cell_sizes = {
        r["cell"]: r["cnt"]
        for r in assigned.groupBy("cell").agg(F.count("*").alias("cnt")).collect()
    }
    print(f"corpus N={n} (k={k}), cells={len(cell_sizes)} "
          f"(requested {ncells}), nprobe={NPROBE}, "
          f"max cell={max(cell_sizes.values())}")
    print(
        f"{'Q':>6} {'join_sec':>9} {'gemm_sec':>9} {'scan_frac':>10} "
        f"{'recall@5':>9} {'kernels_agree':>13}"
    )
    rows = []
    q_list = tuple(
        int(q)
        for q in os.environ.get("SPARK_GRAFT_ANN_QS", "20,500,5000").split(",")
    )
    for q_max in q_list:
        if q_max > n:
            print(f"{q_max:>6}  skipped (Q > N)")
            continue
        topk, pairs = ivf_topk(assigned, centroids, q_max)
        if skip_join:
            got, ivf_sec = [], float("nan")
        else:
            t0 = time.perf_counter()
            got = topk.collect()
            ivf_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        got_gemm = ivf_topk_gemm(
            assigned, centroids, q_max, nprobe=NPROBE
        ).collect()
        gemm_sec = time.perf_counter() - t0
        if skip_join:
            got = got_gemm  # recall below is measured on the GEMM result
        # Tie-aware agreement: the two kernels sum dot products in
        # different orders, so ulp-level noise can swap which of two
        # NEAR-TIED candidates ranks k vs k+1 (the replica corpus is full
        # of near-ties by construction). Exact-set equality is the wrong
        # bar; a symmetric-difference pair only counts as disagreement if
        # its sims differ by more than 1e-6 (i.e. the kernels genuinely
        # ranked different vectors, not the same value twice).
        js = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in got}
        gs = {(r["query_id"], r["neighbor_id"]): r["cos_sim"] for r in got_gemm}
        kth_j = {}
        for (q, _), s in js.items():
            kth_j[q] = min(s, kth_j.get(q, float("inf")))
        kth_g = {}
        for (q, _), s in gs.items():
            kth_g[q] = min(s, kth_g.get(q, float("inf")))
        real_diff = [
            p
            for p in set(js) ^ set(gs)
            if abs((js.get(p) or gs.get(p))
                   - (kth_j.get(p[0], 0) if p in gs else kth_g.get(p[0], 0)))
            > 1e-6
        ]
        agree = not real_diff
        n_pairs = pairs.count()
        scan_frac = n_pairs / (q_max * n)
        # recall on an even spread of sampled queries
        step = max(1, q_max // N_SAMPLE)
        sample_ids = list(range(0, q_max, step))[:N_SAMPLE]
        exact = exact_topk_sampled(assigned, sample_ids).collect()
        exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
        got_set = {
            (r["query_id"], r["neighbor_id"])
            for r in got
            if r["query_id"] in set(sample_ids)
        }
        recall = len(exact_set & got_set) / len(exact_set)
        print(
            f"{q_max:>6} {ivf_sec:>9.2f} {gemm_sec:>9.2f} {scan_frac:>10.3f} "
            f"{recall:>9.3f} {'skipped' if skip_join else str(agree):>13}"
        )
        rows.append((q_max, ivf_sec, gemm_sec, scan_frac, recall))
    spark.stop()


if __name__ == "__main__":
    main()
