"""Temporal non-equi kernels: as-of enrichment and interval range join
(stages/temporal.py)."""
import duckdb
import numpy as np
import pandas as pd
import pytest

from dataflow_mm_ray.partition import partition_map_pandas
from dataflow_mm_ray.stages.temporal import asof_enrich_kernel, incident_count_kernel

SF = "/root/testdata/sf0.001"


def _events(n=400, users=7, seed=3):
    rng = np.random.RandomState(seed)
    ts0 = np.int64(1_700_000_000_000_000)
    ts = ts0 + rng.randint(0, 3_600_000_000 * 24, size=n).astype(np.int64)
    # force some exact-tie timestamps (ordering must fall back to event_id)
    ts[1] = ts[0]
    ts[5] = ts[4]
    value = rng.rand(n) * 100
    # NULL values on some clicks: the enrichment must report the prior
    # click's (id, NaN) pair, never skip back to an earlier click's value
    value[rng.rand(n) < 0.25] = np.nan
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": rng.randint(0, users, size=n).astype(np.int64),
            "event_type": rng.choice(["click", "error", "view"], size=n),
            "value": value,
        }
    )


def _oracle(df, sql):
    con = duckdb.connect()
    con.register("events", df)
    return con.execute(sql).df()


ASOF_SQL = """
WITH s AS (
  SELECT user_id,
         CAST(row_number() OVER w - 1 AS INTEGER) AS turn_idx,
         last_value(CASE WHEN event_type='click'
                         THEN {'id': event_id, 'v': value} END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pc
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, turn_idx, CAST(pc.id AS DOUBLE) AS pid, CAST(pc.v AS DOUBLE) AS pval FROM s
"""

RANGE_SQL = """
WITH inc AS (SELECT user_id, ts AS s, ts + INTERVAL 1800 SECOND AS e
             FROM events WHERE event_type = 'error'),
t AS (SELECT user_id, ts,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER)
               AS turn_idx FROM events)
SELECT t.user_id, t.turn_idx, CAST(count(i.s) AS BIGINT) AS n
FROM t LEFT JOIN inc i ON i.user_id = t.user_id AND i.s <= t.ts AND t.ts < i.e
GROUP BY 1, 2
"""


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


def test_asof_matches_duckdb():
    ev = _events()
    got = asof_enrich_kernel(ev)
    got["uid"] = got["conv_id"].str[5:].astype(np.int64)
    want = _oracle(ev, ASOF_SQL)
    g = _sorted(got[["uid", "turn_idx", "prior_click_event_id", "prior_click_value"]],
                ["uid", "turn_idx"])
    w = _sorted(want.rename(columns={"user_id": "uid", "pid": "prior_click_event_id",
                                     "pval": "prior_click_value"}), ["uid", "turn_idx"])
    pd.testing.assert_frame_equal(g, w, check_exact=True, check_dtype=False)


def test_range_join_matches_duckdb():
    ev = _events()
    got = incident_count_kernel(ev)
    got["uid"] = got["conv_id"].str[5:].astype(np.int64)
    want = _oracle(ev, RANGE_SQL)
    g = _sorted(got[["uid", "turn_idx", "n_open_incidents"]], ["uid", "turn_idx"])
    w = _sorted(want.rename(columns={"user_id": "uid", "n": "n_open_incidents"}),
                ["uid", "turn_idx"])
    pd.testing.assert_frame_equal(g, w, check_exact=True, check_dtype=False)


def test_asof_strictly_prior_and_segmented():
    # one user: click at t0 enriches later turns, not itself; a second
    # user's rows never see the first user's click
    ev = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": pd.to_datetime([1_000, 2_000, 3_000, 500], unit="us"),
            "user_id": np.array([1, 1, 1, 2], dtype=np.int64),
            "event_type": ["click", "view", "click", "view"],
            "value": [10.0, 20.0, 30.0, 40.0],
        }
    )
    out = asof_enrich_kernel(ev).set_index(["conv_id", "turn_idx"])
    assert np.isnan(out.loc[("conv-000001", 0), "prior_click_value"])  # itself: strictly prior
    assert out.loc[("conv-000001", 1), "prior_click_value"] == 10.0
    assert out.loc[("conv-000001", 2), "prior_click_value"] == 10.0  # click@3000 not yet prior
    assert np.isnan(out.loc[("conv-000002", 0), "prior_click_value"])  # other conv isolated


def test_range_join_boundaries():
    # interval [t, t+1800s): start inclusive, end exclusive; overlaps add up
    us = 1_000_000
    ev = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "ts": pd.to_datetime(
                [0, 900 * us, 1800 * us, 2000 * us, 2700 * us], unit="us"
            ),
            "user_id": np.zeros(5, dtype=np.int64),
            "event_type": ["error", "error", "view", "view", "view"],
            "value": np.zeros(5),
        }
    )
    out = incident_count_kernel(ev).sort_values("turn_idx")
    # t=0: own incident; t=900: both; t=1800: first ended exactly, second open;
    # t=2000: second only; t=2700: second ended exactly
    assert out["n_open_incidents"].tolist() == [1, 2, 1, 1, 0]


@pytest.mark.parametrize("kernel", [asof_enrich_kernel, incident_count_kernel])
def test_partition_independence(kernel):
    # oracle parity of the registered queries is pinned registry-wide
    # by tests/test_cep_queries.py; here: identical rows at any P
    ev = _events(n=600, users=23)
    ref = _sorted(kernel(ev), ["conv_id", "turn_idx"])
    for p in (1, 4, 9):
        got = _sorted(
            partition_map_pandas(ev, "user_id", kernel, num_partitions=p),
            ["conv_id", "turn_idx"],
        )
        pd.testing.assert_frame_equal(got, ref, check_exact=True)


def test_conv_id_parity_large_user_ids():
    """printf('%06d') in the oracle == str.zfill(6) in the engine for
    7+-digit user ids (lpad would TRUNCATE them, merging users >= 1e6
    into shared conv_ids — the scale inputs shift user_id by millions)."""
    from dataflow_mm_ray.sources.transcripts import TRANSCRIPTS_CTE, _events_to_turns

    ev = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": pd.to_datetime([1, 2, 3, 4], unit="us"),
            "user_id": np.array([5, 999999, 1000000, 12345678], dtype=np.int64),
            "event_type": ["click"] * 4,
            "props": ["{}"] * 4,
        }
    )
    got = set(_events_to_turns(ev)["conv_id"])
    con = duckdb.connect()
    con.register("events", ev)
    want = set(
        con.execute(TRANSCRIPTS_CTE + "SELECT conv_id FROM transcripts").df()["conv_id"]
    )
    assert got == want == {"conv-000005", "conv-999999", "conv-1000000", "conv-12345678"}
