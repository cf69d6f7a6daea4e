"""Temporal operators (as-of join, range join, session/sliding windows):
edge-case fixtures the testdata never hits — ts ties, exact window
boundaries, single-sided users — each checked against the module's OWN
DuckDB oracle SQL run on the same fixture, so the Ray kernel and the
oracle can never drift apart silently."""

import datetime as dt

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eridu_ray.pipelines import temporal

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk_events(tmp_path, rows):
    """rows: (event_id, minutes_from_T0, user_id, event_type, value)"""
    tab = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([T0 + dt.timedelta(minutes=r[1]) for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([float(r[4]) for r in rows], pa.float64()),
        "props": pa.array(["" for _ in rows], pa.string()),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _oracle(sf_dir: str, name: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')")
    return con.sql(temporal.ORACLE_SQL[name]).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _run(sf_dir: str, name: str) -> pd.DataFrame:
    return temporal.TEMPORAL_QUERIES[name](sf_dir).to_pandas()


def _assert_matches_oracle(sf_dir, name):
    got, want = _canon(_run(sf_dir, name)), _canon(_oracle(sf_dir, name))
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  rtol=0, atol=1e-9)
    return got


def test_asof_ties_and_strictness(tmp_path):
    sf = _mk_events(tmp_path, [
        # user 1: two clicks at the SAME ts before the purchase -> the
        # max event_id must win; a click AT the purchase ts is excluded
        (1, 10, 1, "click", 1.0),
        (2, 10, 1, "click", 1.0),
        (3, 30, 1, "click", 1.0),      # at purchase ts: strict < drops it
        (4, 30, 1, "purchase", 5.0),
        # user 2: purchase with no prior click -> inner join drops it
        (5, 10, 2, "purchase", 5.0),
        (6, 20, 2, "click", 1.0),      # click AFTER the purchase
        # user 3: clicks only -> nothing emitted
        (7, 5, 3, "click", 1.0),
    ])
    got = _assert_matches_oracle(sf, "asof_join")
    row = got.set_index("purchase_id").loc[4]
    assert row["click_id"] == 2              # ts tie -> max event_id
    assert set(got["purchase_id"]) == {4}


def test_asof_cross_user_isolation(tmp_path):
    # user 2's later click must never be matched to user 1's purchase
    sf = _mk_events(tmp_path, [
        (1, 10, 2, "click", 1.0),
        (2, 20, 1, "purchase", 5.0),
        (3, 5, 1, "click", 1.0),
    ])
    got = _assert_matches_oracle(sf, "asof_join")
    assert got.set_index("purchase_id").loc[2, "click_id"] == 3


def test_range_join_boundaries(tmp_path):
    w = int(temporal.RANGE_WINDOW_US // 60_000_000)   # minutes
    sf = _mk_events(tmp_path, [
        (1, 0, 1, "view", 1.0),
        (2, 0, 1, "view", 1.0),        # same ts: strict > excludes pair
        (3, w, 1, "view", 1.0),        # exactly +window: included
        (4, w + 1, 1, "view", 1.0),    # beyond: only from event 3's window
        (5, 0, 2, "view", 1.0),        # other user: isolated
    ])
    got = _assert_matches_oracle(sf, "range_join")
    pairs = set(zip(got.event_id_a, got.event_id_b))
    assert (1, 3) in pairs and (2, 3) in pairs
    assert (1, 2) not in pairs and (2, 1) not in pairs   # ts tie
    assert (1, 4) not in pairs                           # > window
    assert (3, 4) in pairs
    assert not [p for p in pairs if 5 in p]


def test_session_gap_boundary_and_numbering(tmp_path):
    gap_min = int(temporal.SESSION_GAP_US // 60_000_000)
    sf = _mk_events(tmp_path, [
        (1, 0, 1, "view", 1.0),
        (2, gap_min, 1, "view", 2.0),            # gap == threshold: same
        (3, 2 * gap_min + 1, 1, "view", 4.0),    # gap > threshold: break
        (4, 0, 2, "view", 8.0),                  # second user: own 1-base
    ])
    got = _assert_matches_oracle(sf, "session_windows")
    u1 = got[got.user_id == 1].sort_values("session")
    assert list(u1["session"]) == [1, 2]
    assert list(u1["n"]) == [2, 1]
    assert list(u1["sum_cents"]) == [300, 400]
    u2 = got[got.user_id == 2]
    assert list(u2["session"]) == [1] and list(u2["n"]) == [1]


def test_sliding_window_membership(tmp_path):
    # one event exactly on a 15-min boundary -> exactly 4 windows, each
    # 15 min apart, all containing the event
    sf = _mk_events(tmp_path, [(1, 45, 1, "view", 1.0)])
    got = _assert_matches_oracle(sf, "sliding_window")
    assert len(got) == 4
    wins = sorted(got["win"])
    ev = pd.Timestamp(T0 + dt.timedelta(minutes=45))
    for i, w in enumerate(wins):
        assert w == pd.Timestamp(T0) + pd.Timedelta(minutes=15 * i)
        assert w <= ev < w + pd.Timedelta(hours=1)
    assert (got["n"] == 1).all() and (got["sum_cents"] == 100).all()


@pytest.mark.parametrize("name", ["asof_join", "range_join",
                                  "session_windows"])
def test_empty_events(tmp_path, name):
    sf = _mk_events(tmp_path, [])
    assert len(_run(sf, name)) == 0


@pytest.mark.parametrize("num_pid", [1, 32])
def test_width_independent_results(tmp_path, num_pid):
    """The pid shuffle width is now a parameter (defaulting from
    PipelineConfig.num_partitions, VERDICT r3 #4); results must be
    identical at any width — equal user key -> equal pid."""
    rows = [(i, 7 * i % 300, i % 5, "click" if i % 3 else "purchase",
             1.0 + i) for i in range(60)]
    sf = _mk_events(tmp_path, rows)
    for name, fn in (("asof_join", temporal.q_asof_join),
                     ("range_join", temporal.q_range_join),
                     ("session_windows", temporal.q_session_windows)):
        got = _canon(fn(sf, num_pid=num_pid).to_pandas())
        want = _canon(_oracle(sf, name))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      rtol=0, atol=1e-9)
