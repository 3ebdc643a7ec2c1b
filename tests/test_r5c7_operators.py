"""Round-5 batch C7: cross-table coverage queries (orders reorder
moments, supplier nation profile, priority crosstab) — oracle parity
at sf0.001.  Semantics are covered by the underlying operators'
unit tests (gap_moments, grouped_stats)."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _oracle_check(name, tables=("orders", "supplier", "nation")):
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


def test_oracle_reorder_moments(ray_session):
    out = _oracle_check("orders_reorder_moments")
    assert len(out) > 0  # customers with >= 2 orders exist


def test_oracle_supplier_nation(ray_session):
    out = _oracle_check("supplier_nation_profile")
    assert len(out) > 0


def test_oracle_priority_crosstab(ray_session):
    out = _oracle_check("orders_priority_status_crosstab")
    assert out.n.sum() > 0
