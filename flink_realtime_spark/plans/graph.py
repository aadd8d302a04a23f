"""Iterative graph primitives over edge relations.

Connected components (llm/dedup.py) turns near-dup pairs into dedup
decisions; PageRank here ranks nodes by link structure — the canonical
iterative-relational algorithm family (Flink exposes these through Gelly /
iterative DataSets; Spark-first they are loops of joins + aggregations
with lineage truncation per round).

Determinism: each round's contribution sum uses DECIMAL(28,15) per-edge
casts, so accumulation order (partitioning, task order) cannot move the
result — the same discipline exprs.dsum applies to money columns. The
fixed round count lets the DuckDB oracle unroll the loop into chained
MATERIALIZED CTE stages (llm/dedup._pagerank_oracle) — graph_pagerank is
hash-checked bit-for-bit at the 12-decimal output rounding, and
tests/test_cluster_props.py additionally checks against numpy power
iteration on random graphs.

Scale: per round, one shuffle keyed on the destination node + one
broadcast-or-shuffle join on ranks. State = one rank per node. Rounds are
fixed (power iteration), so the plan is `iters` repetitions of the same
two-exchange stage; localCheckpoint truncates lineage each round (object
storage checkpoints on a cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,15)"

# The previous invocation's persisted edge relation. persist() registers
# the plan in Spark's CacheManager, whose lookup is by plan equality — a
# SECOND invocation of the same query in the same session would silently
# reuse the first invocation's materialized cache instead of recomputing
# from parquet, which the bench/oracle contract forbids (every invocation
# must compute from the inputs). Dropping the previous pin at build time
# keeps the persist strictly per-invocation: within one invocation the
# 10 rounds share the single materialization; across invocations nothing
# is reused.
_PINNED_EDGES: list = []


def _pin_per_invocation(df: DataFrame) -> DataFrame:
    while _PINNED_EDGES:
        old = _PINNED_EDGES.pop()
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass  # session of the old pin may be stopped; nothing to free
    pinned = df.persist()
    _PINNED_EDGES.append(pinned)
    return pinned


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    beta: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Power-iteration PageRank. ``nodes``: column ``id``; ``edges``:
    columns (src, dst), directed (symmetrize upstream for undirected
    graphs). Dangling nodes redistribute uniformly. Returns (id, rank),
    ranks summing to 1."""
    n = nodes.count()
    if n == 0:
        # Rank of an empty graph is the empty relation — the 1/n seed and
        # the (1-beta)/n teleport below would both divide by zero
        # (empty-shape probe find, r09).
        return nodes.select("id", F.lit(0.0).alias("rank"))
    out_deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("deg")
    ).localCheckpoint(eager=False)
    # Degree-annotated edge relation is STATIC across rounds — join it
    # once here instead of once per round (10 joins saved at iters=10;
    # at 100 TB this is the classic invariant-hoisting every iterative
    # dataflow needs, the same reason Flink's iterate() keeps loop
    # constants cached).
    # r12 (guide §2.4 — remove shuffles outright): the relation is
    # hash-partitioned by src ONCE and pinned with persist(), so every
    # round's contribution join consumes that partitioning instead of
    # re-shuffling the edge relation per round (iters fact-sized
    # exchanges -> 1 at scale; at fixture scale the ranks side
    # broadcasts and the one-time repartition is the only cost).
    # persist, not localCheckpoint: under AQE a checkpointed frame
    # reports UnknownPartitioning (AdaptiveSparkPlanExec hides the final
    # partitioning), while a cached plan compiles with AQE off
    # (canChangeCachedPlanOutputPartitioning=false default) and keeps
    # HashPartitioning visible to EnsureRequirements — measured: the
    # checkpoint form re-shuffles edges in every round's SMJ, the
    # persisted form never does. Safe to persist (the correctness rule
    # reserves localCheckpoint for per-materialization values): edge
    # content is deterministic, so an evicted partition recomputes
    # identically. Partition count = defaultParallelism (cluster-total
    # cores), scale-adaptive, not a local[32] constant; lineage stays
    # shallow because pairs/out_deg above are checkpointed. The pin is
    # strictly per-invocation (_pin_per_invocation drops the previous
    # one) so no bench/oracle invocation reuses a prior run's cache.
    try:
        # Spark Connect has no SparkContext handle (the rebalance()
        # pattern): fall back to the checkpointed form there.
        sc_parallelism = edges.sparkSession.sparkContext.defaultParallelism
    except Exception:
        sc_parallelism = None
    if sc_parallelism:
        edges_w = _pin_per_invocation(
            edges.join(out_deg, "src")
            .select("src", "dst", "deg")
            .repartition(sc_parallelism, "src")
        )
    else:
        edges_w = (
            edges.join(out_deg, "src")
            .select("src", "dst", "deg")
            .localCheckpoint(eager=False)
        )
    # r11 restructure (guide §2.4 — remove shuffles outright): the ranks
    # relation carries its STATIC dangling flag (deg IS NULL at seed
    # time), so the per-round dangling mass is a filter + 1-row aggregate
    # over ranks instead of a semi-join against a separate dangling-node
    # relation (2 exchanges/round gone), and the per-round `nodes LEFT
    # JOIN contribs` update (2 more exchanges) collapses into the
    # contribution aggregate itself: union one zero-contribution row per
    # node (carrying the flag) with the per-edge contributions, and the
    # groupBy(id) emits EXACTLY one row per node — sum(c + 0) is the same
    # decimal sum, a no-inflow node sums the bare zero row (= the old
    # coalesce(inflow, 0.0)), and an edge dst outside `nodes` has
    # max(dang) NULL and is dropped by the flag filter (the old inner
    # membership semantics of the nodes join). Each round is now ONE
    # fact-sized exchange (the combined contribution aggregate, map-side
    # partial) + the node-sized ranks exchange feeding the edges join +
    # a 1-row broadcast — versus joins keyed three different ways.
    ranks = (
        nodes.join(out_deg, nodes["id"] == out_deg["src"], "left")
        .select(
            "id",
            F.lit(1.0 / n).alias("rank"),
            F.col("deg").isNull().alias("dang"),
        )
        .localCheckpoint(eager=False)
    )
    # Lineage truncation every SECOND round, not every round: each round
    # references ranks ~3× (contribs, zero rows, dangling mass), so the
    # un-truncated plan tree grows ~3^k across k un-checkpointed rounds —
    # but one round of that growth is cheap to plan, and each checkpoint
    # is a materialization barrier. Measured at sf0.1: every-round 3.14 s,
    # every-2 2.27 s, every-5 3.62 s (plan blowup wins again) — 2 is the
    # sweet spot. Ranks are bit-identical either way (decimal sums).
    for _i in range(iters):
        contribs_in = edges_w.join(
            ranks, edges_w["src"] == ranks["id"]
        ).select(
            F.col("dst").alias("id"),
            (F.col("rank") / F.col("deg")).cast(_DEC).alias("c"),
            F.lit(None).cast("boolean").alias("dang"),
        )
        zero = ranks.select(
            "id", F.lit(0).cast(_DEC).alias("c"), "dang"
        )
        agg = (
            contribs_in.unionByName(zero)
            .groupBy("id")
            .agg(
                F.sum("c").cast("double").alias("inflow"),
                F.max("dang").alias("dang"),
            )
            .filter(F.col("dang").isNotNull())
        )
        # dangling mass as a broadcast 1-row relation: the whole round stays
        # ONE distributed plan — no driver round-trip per iteration
        dmass = ranks.filter(F.col("dang")).agg(
            F.sum(F.col("rank").cast(_DEC)).cast("double").alias("dm")
        )
        ranks = agg.crossJoin(F.broadcast(dmass)).select(
            "id",
            (
                F.lit((1.0 - beta) / n)
                + F.lit(beta) * F.coalesce("dm", F.lit(0.0)) / n
                + F.lit(beta) * F.coalesce("inflow", F.lit(0.0))
            ).alias("rank"),
            "dang",
        )
        if _i % 2 == 1 or _i == iters - 1:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("id", "rank")
