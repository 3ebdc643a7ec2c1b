"""funnel_counts: scalar-reference semantics (windows chain off the
PREVIOUS matched step), user scatter across blocks, driver oracle."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df, blocks=1):
    import ray.data as rd

    out = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    return out.repartition(blocks) if blocks > 1 else out


def _ev(rows):
    return pd.DataFrame(rows, columns=["user_id", "ts", "event_type"]
                        ).astype({"user_id": "int64"})


def test_windows_chain_off_previous_step(ray_session):
    from verify_ray.pipelines.sessions import funnel_counts

    t0 = pd.Timestamp("2024-01-01")
    h = pd.Timedelta(hours=1)
    rows = [
        # user 1: completes A -> B (+2h) -> C (+2h after B): all in
        (1, t0, "A"), (1, t0 + 2 * h, "B"), (1, t0 + 4 * h, "C"),
        # user 2: B inside window, C only BEFORE B -> stops at B
        (2, t0, "A"), (2, t0 + 2 * h, "B"), (2, t0 + 1 * h, "C"),
        # user 3: B too late (window is 3h) -> stops at A
        (3, t0, "A"), (3, t0 + 5 * h, "B"), (3, t0 + 6 * h, "C"),
        # user 4: C within 3h of t0 but NOT of B's match -> stops at B
        (4, t0, "A"), (4, t0 + 3 * h, "B"), (4, t0 + 2 * h, "C"),
        # user 5: no A at all -> never enters
        (5, t0, "B"), (5, t0 + 1 * h, "C"),
    ]
    out = funnel_counts(_ds(_ev(rows), blocks=4), ["A", "B", "C"],
                        within_us=3 * 3_600_000_000)
    assert out.n_users.tolist() == [4, 3, 1]
    assert out.step.tolist() == ["A", "B", "C"]


def test_exact_boundary_inclusive(ray_session):
    from verify_ray.pipelines.sessions import funnel_counts

    t0 = pd.Timestamp("2024-01-01")
    rows = [(1, t0, "A"), (1, t0, "B"),  # B at exactly t0: ts >= t0 ok
            (2, t0, "A"),
            (2, t0 + pd.Timedelta(hours=3), "B")]  # exactly window end
    out = funnel_counts(_ds(_ev(rows)), ["A", "B"],
                        within_us=3 * 3_600_000_000)
    assert out.n_users.tolist() == [2, 2]


def test_driver_query_matches_oracle(ray_session):
    import __ray_entry__ as e

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        mine = e.queries()["events_funnel"](sf).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        orc = con.execute(e.oracle_sql()["events_funnel"]).df()
        assert list(mine.columns) == list(orc.columns)
        assert mine.n_users.tolist() == orc.n_users.tolist(), sf
        assert mine.step.tolist() == orc.step.tolist()
        # funnel must be non-trivial and monotone non-increasing
        n = mine.n_users.to_numpy()
        assert n[0] > 0 and np.all(np.diff(n) <= 0)


def test_cohort_retention_matches_oracle(ray_session):
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    mine = e.queries()["cohort_retention"](sf).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = con.execute(e.oracle_sql()["cohort_retention"]).df()
    assert list(mine.columns) == list(orc.columns)
    assert np.array_equal(mine.values.astype("int64"),
                          orc.values.astype("int64"))
