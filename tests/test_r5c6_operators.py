"""Round-5 batch C6: word-length histogram, session-size histogram,
part brand profile — unit semantics + oracle parity at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _ds(table: pa.Table, blocks: int = 2):
    import ray.data as rd

    return rd.from_arrow(table).repartition(blocks).materialize()


def _oracle_check(name, tables=("events", "documents", "part")):
    import __ray_entry__ as e

    mine = e.queries()[name](SF)
    if not isinstance(mine, pd.DataFrame):
        mine = mine.to_pandas()
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    orc = con.execute(e.oracle_sql()[name]).df()
    assert list(mine.columns) == list(orc.columns)
    assert len(mine) == len(orc)
    for c in mine.columns:
        a, b = mine[c].to_numpy(), orc[c].to_numpy()
        if a.dtype == object or b.dtype == object:
            assert list(map(str, a)) == list(map(str, b)), c
        else:
            assert np.array_equal(a, b), c
    return mine


def test_wordlen_hist_counts(ray_session):
    from verify_ray.pipelines.text import wordlen_hist

    t = pa.table({"lang": ["en", "en", "de"],
                  "text": ["ab cde ab", "x", None]})
    out = wordlen_hist(_ds(t))
    # en: 'ab' x2 (len 2), 'cde' (3), 'x' (1); de row drops (null)
    assert list(out.grp) == ["en", "en", "en"]
    assert list(out.wordlen) == [1, 2, 3]
    assert list(out.n) == [1, 2, 1]


def test_session_size_hist_matches_sessionize(ray_session):
    from verify_ray.pipelines.sessions import (session_size_hist,
                                               sessionize)

    # two users; 31-minute gap splits user 1's events
    base = 1_700_000_000_000_000
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([base, base + 60_000_000,
                        base + 60_000_000 + 31 * 60_000_000, base],
                       pa.timestamp("us")),
        "value": pa.array([1.0, 1.0, 1.0, 1.0], pa.float64())})
    out = session_size_hist(_ds(t))
    # sessions: user1 [2 events], user1 [1], user2 [1]
    assert list(out.session_size) == [1, 2]
    assert list(out.n_sessions) == [2, 1]
    ses = sessionize(_ds(t))
    ref = ses.n_events.value_counts().sort_index()
    assert list(out.n_sessions) == list(ref.to_numpy())


def test_oracle_wordlen(ray_session):
    _oracle_check("docs_wordlen_hist")


def test_oracle_session_size_hist(ray_session):
    _oracle_check("events_session_size_hist")


def test_oracle_brand_profile(ray_session):
    _oracle_check("part_brand_profile")
