"""Skew mitigation for large joins — SCALE.md made concrete.

AQE's skew-join split handles sort-merge joins automatically, but two cases
still need explicit salting at 100 TB: aggregations over a hot key, and
joins where one side must replicate. ``salted_join`` implements the
standard pattern: the skewed (probe) side gets a random-free deterministic
salt derived from a high-cardinality column; the build side is replicated
across all salt values via an explode; the join key becomes (key, salt), so
one hot key spreads over ``n_salts`` reducers. Deterministic salting (hash
of a row id, not rand()) keeps results reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (hot keys) with ``small`` (replicable) on ``key``,
    spreading each key over n_salts partitions. ``salt_from`` must be a
    column on the skewed side with per-row variation (an id), so the salt
    is deterministic. The small side is exploded n_salts×; keep it small.

    Only skewed-side-preserving join types are legal: with a replicated
    build side, right/full outer would emit every unmatched small-side row
    once per salt replica. The composite (key, salt) join key is a
    deliberate exemption from the scalars-only join-key rule (CLAUDE.md):
    folding it through a hash would admit collision false-matches, and the
    salt column is a dense int that hash-partitions fine."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports skewed-side-preserving joins only "
            f"(got {how!r}): a replicated build side would duplicate "
            f"unmatched right-side rows once per salt"
        )
    salted = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))),
    )
    out = salted.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")
