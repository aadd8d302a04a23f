"""Direct (no-Spark) pins for the null guards the r08 nulls tier forced
into the pure-Python kernels. The tier itself (drive_driver --sf
.../nulls, verify SKILL.md step 12) is the end-to-end net; these run in
the fast gate so a regression in a kernel's null path fails in seconds,
not at round close.
"""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa


def test_cogroup_profile_null_key_and_null_values():
    """NULL is a valid cogroup key (grouping semantics) and SQL SUM skips
    NULL values while the row still counts — and the output Arrow table
    must carry an explicit int64 key column even when the key is None
    (pa.table would otherwise infer the NULL type and trip Spark's
    schema verifier)."""
    from flink_realtime_spark.operators.joins import _cogroup_profile

    ev = pa.table(
        {
            "user_id": pa.array([None, None, None], type=pa.int64()),
            "value": pa.array([1.5, None, 2.25], type=pa.float64()),
        }
    )
    od = pa.table({"o_custkey": pa.array([None], type=pa.int64())})
    out = _cogroup_profile(ev, od)
    assert out.schema.field("key").type == pa.int64()
    assert out.column("key")[0].as_py() is None
    assert out.column("n_events")[0].as_py() == 3
    assert out.column("n_orders")[0].as_py() == 1
    assert out.column("sum_value")[0].as_py() == 3.75

    # all-NULL values: sum is 0.0 (the oracle's COALESCE contract)
    ev2 = pa.table(
        {
            "user_id": pa.array([7], type=pa.int64()),
            "value": pa.array([None], type=pa.float64()),
        }
    )
    od2 = od.slice(0, 0)
    out2 = _cogroup_profile(ev2, od2)
    assert out2.column("key")[0].as_py() == 7
    assert out2.column("sum_value")[0].as_py() == 0.0


def test_decode_media_null_payload():
    """A NULL media payload decodes to NULL metadata (nullable Int64),
    never a worker crash; non-null rows keep the stub arithmetic."""
    from flink_realtime_spark.llm.multimodal import decode_media

    pdf = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2], dtype="int64"),
            "media_type": ["image", "audio"],
            "media": [bytes([10, 20, 30, 40]), None],
        }
    )
    (out,) = list(decode_media()(iter([pdf])))
    assert out["byte_len"].tolist()[0] == 4
    assert pd.isna(out["byte_len"].iloc[1])
    assert out["height"].tolist()[0] == 10
    assert pd.isna(out["height"].iloc[1])
    assert out["channels"].tolist()[0] == 30 % 4 + 1
    assert pd.isna(out["channels"].iloc[1])


def test_split_words_udtf_null_text():
    """The REGISTERED UDTF class (reached through the wrapper's .func)
    yields no rows for NULL text, matching unnest(str_split(NULL, ' ')),
    and still splits real text with 1-based positions."""
    from flink_realtime_spark.functions.udx import _split_words_udtf

    inst = _split_words_udtf().func()
    assert list(inst.eval(None)) == []
    assert list(inst.eval("a  b")) == [("a", 1), ("b", 3)]


def test_cosine_expr_zero_norm_is_null(spark):
    """Zero-norm contract (r08): a directionless vector's similarity is
    NULL — not an ANSI DIVIDE_BY_ZERO kill (Spark without the NULLIF
    guard), not -1.0 (DuckDB's list_cosine_similarity answer). Real
    pairs are untouched."""
    from pyspark.sql import functions as F

    from flink_realtime_spark.llm.dedup import cosine_expr

    df = spark.createDataFrame(
        [
            ([0.0, 0.0], [1.0, 2.0]),
            ([3.0, 4.0], [3.0, 4.0]),
            ([1.0, 0.0], [0.0, 2.0]),
        ],
        "a array<double>, b array<double>",
    )
    got = [r[0] for r in df.select(cosine_expr("a", "b")).collect()]
    assert got[0] is None
    assert abs(got[1] - 1.0) < 1e-12
    assert abs(got[2] - 0.0) < 1e-12


def test_gemm_kernels_skip_zero_norm_rows(spark, tmp_path):
    """END-TO-END zero-vector robustness: a zero-norm embedding in the
    corpus must not crash or pair in the REGISTERED operators — the
    per-cluster GEMM (llm_dedup_semantic), the tiled GEMM
    (llm_dedup_embcos), and the codegen join (llm_knn_cosine, which
    raised ANSI DIVIDE_BY_ZERO before cosine_expr's NULLIF guard)."""
    import numpy as np
    import pandas as pd

    from flink_realtime_spark import registry

    registry.load_all()
    emb = pd.DataFrame(
        {
            "vec_id": pd.Series([0, 1, 2, 3], dtype="int64"),
            "embedding": [
                np.array([1.0, 0.0], dtype=np.float32),
                np.array([0.0, 0.0], dtype=np.float32),  # zero norm
                np.array([0.9, 0.1], dtype=np.float32),
                np.array([-1.0, 0.0], dtype=np.float32),
            ],
            "label": pd.Series([5, 5, 5, 5], dtype="int32"),
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(emb).write.parquet(f"{sf}/embeddings.parquet")

    sem = registry.QUERIES["llm_dedup_semantic"](spark, sf).collect()
    assert {(r.vec_a, r.vec_b) for r in sem} == {(0, 2)}

    cos = registry.QUERIES["llm_dedup_embcos"](spark, sf).collect()
    assert {(r.vec_a, r.vec_b) for r in cos} == {(0, 2)}

    knn = registry.QUERIES["llm_knn_cosine"](spark, sf).collect()
    # every query ranks real neighbors first; the zero vector never has
    # a non-null similarity (it may appear as a trailing null-sim row)
    best = {r.query_id: r.neighbor_id for r in knn if r.rank == 1}
    assert best[0] == 2 and best[2] == 0
    assert all(r.cos_sim is None for r in knn if r.neighbor_id == 1)
    assert all(r.cos_sim is None for r in knn if r.query_id == 1)
