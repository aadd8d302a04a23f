"""Focused contract pins for the r12 agg_funnel_window rewrite (join
form -> one-scan window/aggregate form). The driver's oracle hash is the
end-to-end equivalence net; these pin the boundary semantics the rewrite
had to reproduce exactly, on a crafted table where each case is visible:

- strict/inclusive window bounds (ts > t1, ts <= t1 + 1 day);
- greedy chaining (a purchase before the FIRST qualifying click does not
  count, even inside the day window);
- the NULL-user group stays at level 0 (the old equi-joins never match
  NULL; GROUP BY/WINDOW would otherwise collapse NULL users into one
  group and hand it a level).
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest

from flink_realtime_spark import registry

registry.load_all()

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)
H = dt.timedelta(hours=1)
DAY = dt.timedelta(days=1)


def _events():
    rows = [
        # user 1: clean view -> click -> purchase chain, all inside a day
        (1, "view", T0), (1, "click", T0 + H), (1, "purchase", T0 + 2 * H),
        # user 2: purchase lands after t1 + 1 day -> stops at level 2
        (2, "view", T0), (2, "click", T0 + H), (2, "purchase", T0 + DAY + H),
        # user 3: view only
        (3, "view", T0),
        # user 4: click without any view -> level 0
        (4, "click", T0),
        # user 5: click BEFORE the first view never qualifies (ts > t1
        # is strict), so the later purchase has no t2 -> level 1
        (5, "click", T0 - H), (5, "view", T0), (5, "purchase", T0 + H),
        # user 6: purchase before the first qualifying click (greedy
        # chaining: needs ts > t2) -> level 2
        (6, "view", T0), (6, "click", T0 + 2 * H), (6, "purchase", T0 + H),
        # user 7: click exactly at t1 is excluded (strict >), exactly at
        # t1 + 1 day is included (inclusive <=); purchase can then never
        # beat the window -> level 2
        (7, "view", T0), (7, "click", T0), (7, "click", T0 + DAY),
        (7, "purchase", T0 + DAY + H),
        # NULL user: a perfect chain that must still read level 0
        (None, "view", T0), (None, "click", T0 + H),
        (None, "purchase", T0 + 2 * H),
    ]
    return pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": [r[2] for r in rows],
            "user_id": pd.array([r[0] for r in rows], dtype="Int64"),
            "event_type": [r[1] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )


@pytest.fixture(scope="module")
def funnel_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("funnel_fixture")
    _events().to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def test_funnel_levels_boundary_and_null_user(spark, funnel_dir):
    out = {
        r["funnel_level"]: r["n_users"]
        for r in registry.QUERIES["agg_funnel_window"](
            spark, funnel_dir
        ).collect()
    }
    # level 0: user 4 (no view) + the NULL-user group
    # level 1: users 3, 5    level 2: users 2, 6, 7    level 3: user 1
    assert out == {0: 2, 1: 2, 2: 3, 3: 1}
