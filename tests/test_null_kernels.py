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
