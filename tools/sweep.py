"""Full driver-style correctness sweep: run EVERY queries() entry at
sf0.01 against its oracle_sql() (rows + columns + exact values, the
driver's compare) and report per-query wall time.

    python tools/sweep.py [--sf /root/testdata/sf0.01] [--only name ...]

Exit code 0 iff every query matches.  Also flags queries slower than
--slow (default 2 s — VERDICT r3 #8: keep the sf0.01 sweep cheap so a
full sweep stays the per-session habit).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def to_df(res):
    import pandas as pd

    return res if isinstance(res, pd.DataFrame) else res.to_pandas()


def main() -> int:
    import duckdb
    import numpy as np
    import ray

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--slow", type=float, default=2.0)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf}/{t}.parquet')")

    names = args.only or sorted(q)
    fails, slow, times = [], [], {}
    for name in names:
        t0 = time.time()
        try:
            mine = normalize(to_df(q[name](args.sf)))
            if name in o:
                orc = normalize(con.execute(o[name]).fetchdf())
                assert list(mine.columns) == list(orc.columns), \
                    f"columns {list(mine.columns)} vs {list(orc.columns)}"
                assert len(mine) == len(orc), \
                    f"rows {len(mine)} vs {len(orc)}"
                for c in mine.columns:
                    a, b = mine[c].to_numpy(), orc[c].to_numpy()
                    if np.issubdtype(mine[c].dtype, np.floating):
                        assert np.allclose(a.astype(float),
                                           b.astype(float), rtol=0,
                                           atol=1e-9, equal_nan=True), c
                    else:
                        import pandas as pd

                        # NaT != NaT and None != None are True in
                        # numpy — null==null must count as equal
                        both_na = (pd.isna(mine[c]).to_numpy()
                                   & pd.isna(orc[c]).to_numpy())
                        assert not ((a != b) & ~both_na).any(), c
                status = "ok"
            else:
                assert len(mine.columns) > 0
                status = "rows-only"
        except Exception as e:  # noqa: BLE001 - sweep must not stop
            status = f"FAIL: {type(e).__name__}: {e}"
            fails.append(name)
        dt = time.time() - t0
        times[name] = round(dt, 2)
        if dt > args.slow:
            slow.append(name)
        print(f"{name:36s} {dt:6.2f}s  {status}", flush=True)

    print(json.dumps({"n": len(names), "fails": fails, "slow": slow,
                      "total_sec": round(sum(times.values()), 1)}))
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
