"""Differentials for the round-4 third-session operators, vs DuckDB.

Bounded hypothesis examples (each runs a Ray pipeline); fixed-seed
unit arms cover the empty/edge paths.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _ds(df: pd.DataFrame, blocks: int = 3):
    import ray.data as rd

    t = pa.Table.from_pandas(df, preserve_index=False)
    n = t.num_rows
    step = max(1, n // blocks) if n else 1
    return rd.from_arrow([t.slice(i, step) for i in range(0, n, step)]
                         if n else t)


def _norm(df: pd.DataFrame) -> list[tuple]:
    df = df.copy()
    df["g"] = df["g"].map(lambda v: "<NULL>" if pd.isna(v) else str(v))
    cols = ["g", "n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]
    return sorted(map(tuple, df[cols].astype(
        {c: "int64" for c in cols[1:]}).itertuples(index=False)))


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_grouped_corr_matches_duckdb(ray_session, data):
    from verify_ray.pipelines.analytics import grouped_corr

    n = data.draw(st.integers(min_value=1, max_value=40))
    groups = data.draw(st.lists(
        st.one_of(st.sampled_from(["a", "b"]), st.none()),
        min_size=n, max_size=n))
    xs = data.draw(st.lists(
        st.one_of(st.integers(min_value=-5, max_value=5), st.none()),
        min_size=n, max_size=n))
    ys = data.draw(st.lists(
        st.one_of(st.integers(min_value=-5, max_value=5), st.none()),
        min_size=n, max_size=n))
    budget = data.draw(st.sampled_from([0, 10**6]))  # exchange / driver
    df = pd.DataFrame({"g": groups,
                       "x": pd.array(xs, dtype="Int64"),
                       "y": pd.array(ys, dtype="Int64")})
    out = grouped_corr(_ds(df), "g", "x", "y", partial_budget=budget)
    ref = duckdb.sql(
        "SELECT g, COUNT(*)::BIGINT AS n,"
        " CAST(SUM(x) AS BIGINT) sum_x, CAST(SUM(y) AS BIGINT) sum_y,"
        " CAST(SUM(x*x) AS BIGINT) sum_xx,"
        " CAST(SUM(y*y) AS BIGINT) sum_yy,"
        " CAST(SUM(x*y) AS BIGINT) sum_xy"
        " FROM df WHERE x IS NOT NULL AND y IS NOT NULL"
        " GROUP BY g").df()
    if len(ref) == 0:
        assert len(out) == 0
        return
    assert _norm(out) == _norm(ref)


def test_grouped_corr_all_null_values(ray_session):
    from verify_ray.pipelines.analytics import grouped_corr

    df = pd.DataFrame({"g": ["a", "b"],
                       "x": pd.array([None, None], dtype="Int64"),
                       "y": pd.array([1, 2], dtype="Int64")})
    out = grouped_corr(_ds(df), "g", "x", "y")
    assert len(out) == 0


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_late_arrivals_matches_duckdb(ray_session, data):
    from verify_ray.pipelines.shuffle import late_arrivals

    n = data.draw(st.integers(min_value=1, max_value=40))
    # unique (possibly negative, non-dense) order keys
    oids = data.draw(st.lists(
        st.integers(min_value=-50, max_value=50), min_size=n, max_size=n,
        unique=True))
    ts = data.draw(st.lists(st.integers(min_value=0, max_value=30),
                            min_size=n, max_size=n))
    w = data.draw(st.integers(min_value=0, max_value=10))
    shards = data.draw(st.sampled_from([1, 3, 8]))
    df = pd.DataFrame({"o": np.asarray(oids, dtype=np.int64),
                       "t": np.asarray(ts, dtype=np.int64)})
    out_ds = late_arrivals(_ds(df), "o", "t", watermark_us=w,
                           n_shards=shards)
    out = (out_ds.to_pandas().sort_values("o").reset_index(drop=True)
           if out_ds.count()
           else pd.DataFrame({"o": pd.Series(dtype="int64"),
                              "late_by_us": pd.Series(dtype="int64")}))
    ref = duckdb.sql(
        "WITH w AS (SELECT o, t, MAX(t) OVER (ORDER BY o ROWS BETWEEN"
        " UNBOUNDED PRECEDING AND 1 PRECEDING) wm FROM df)"
        f" SELECT o, CAST(wm - t AS BIGINT) late_by_us FROM w"
        f" WHERE wm IS NOT NULL AND t + {w} < wm ORDER BY o").df()
    assert out["o"].tolist() == ref["o"].tolist()
    assert out["late_by_us"].tolist() == ref["late_by_us"].tolist()


def test_late_arrivals_null_rows_dropped(ray_session):
    from verify_ray.pipelines.shuffle import late_arrivals

    df = pd.DataFrame({"o": pd.array([1, None, 3, 4], dtype="Int64"),
                       "t": pd.array([10, 5, None, 1], dtype="Int64")})
    out = late_arrivals(_ds(df), "o", "t", watermark_us=2)
    got = out.to_pandas().sort_values("o").reset_index(drop=True)
    # surviving ordered rows: (1,10), (4,1) -> 4 is late by 9
    assert got["o"].tolist() == [4]
    assert got["late_by_us"].tolist() == [9]


@settings(max_examples=5, deadline=None)
@given(data=st.data())
def test_triangle_count_matches_duckdb(ray_session, data):
    from verify_ray.pipelines.graph import triangle_count

    n = data.draw(st.integers(min_value=1, max_value=120))
    src = data.draw(st.lists(st.integers(min_value=0, max_value=25),
                             min_size=n, max_size=n))
    dst = data.draw(st.lists(st.integers(min_value=0, max_value=25),
                             min_size=n, max_size=n))
    bn = data.draw(st.sampled_from([0, 10**6]))  # join / broadcast route
    df = pd.DataFrame({"src": np.asarray(src, dtype=np.int64),
                       "dst": np.asarray(dst, dtype=np.int64)})
    out = triangle_count(_ds(df), "src", "dst", num_buckets=4,
                         broadcast_nodes=bn)
    ref = duckdb.sql(
        "WITH pairs AS (SELECT DISTINCT least(src,dst) u,"
        " greatest(src,dst) v FROM df WHERE src <> dst)"
        " SELECT (SELECT COUNT(*) FROM pairs) n_edges,"
        " (SELECT COUNT(*) FROM pairs e1"
        "  JOIN pairs e2 ON e2.u = e1.u AND e2.v > e1.v"
        "  JOIN pairs e3 ON e3.u = e1.v AND e3.v = e2.v) n_tri").df()
    assert out["n_edges"][0] == ref["n_edges"][0]
    assert out["n_triangles"][0] == ref["n_tri"][0]


def test_triangle_count_shapes(ray_session):
    from verify_ray.pipelines.graph import triangle_count

    # self-loop only -> empty graph
    loop = pd.DataFrame({"src": [1], "dst": [1]})
    assert triangle_count(_ds(loop), num_buckets=4).values.tolist() \
        == [[0, 0, 0]]
    # path 1-2-3-4: no oriented wedge (max oriented out-degree is 1)
    path = pd.DataFrame({"src": [1, 2, 3], "dst": [2, 3, 4]})
    assert triangle_count(_ds(path), num_buckets=4).values.tolist() \
        == [[3, 0, 0]]
    # triangle (with a parallel edge): one oriented wedge, closed
    tri = pd.DataFrame({"src": [1, 2, 1, 1], "dst": [2, 3, 3, 2]})
    assert triangle_count(_ds(tri), num_buckets=4).values.tolist() \
        == [[3, 1, 1]]


def test_cooccurrence_edges_matches_duckdb(ray_session):
    from verify_ray.pipelines.graph import cooccurrence_edges

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"g": rng.integers(0, 20, 200),
                       "i": rng.integers(0, 15, 200)})
    out = cooccurrence_edges(_ds(df), "g", "i", num_buckets=4).to_pandas()
    # parallel edges allowed; compare the multiset of canonical pairs
    got = sorted(map(tuple, out[["x", "y"]].itertuples(index=False)))
    ref = duckdb.sql(
        "WITH gi AS (SELECT DISTINCT g, i FROM df)"
        " SELECT a.i x, b.i y FROM gi a JOIN gi b"
        " ON a.g = b.g AND a.i < b.i").df()
    assert got == sorted(map(tuple, ref.itertuples(index=False)))


@settings(max_examples=10, deadline=None)
@given(data=st.data())
def test_levenshtein_block_matches_duckdb(data):
    from verify_ray.pipelines.text import _levenshtein_block

    n = data.draw(st.integers(min_value=1, max_value=30))
    alpha = st.text(alphabet="abcé漢", min_size=0, max_size=10)
    al = data.draw(st.lists(alpha, min_size=n, max_size=n))
    bl = data.draw(st.lists(alpha, min_size=n, max_size=n))
    got = _levenshtein_block(al, bl, trunc=24)
    df = pd.DataFrame({"a": al, "b": bl})
    ref = duckdb.sql("SELECT levenshtein(a, b) d FROM df").df()["d"]
    assert got.tolist() == ref.tolist()


def test_edit_distance_pairs_blocking(ray_session):
    from verify_ray.pipelines.text import edit_distance_pairs

    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["abcdef", "abcdxf",        # same prefix, dist 1
                 "abcdefgh",                # same prefix, dist 2 of 0
                 "zbcdef",                  # differs INSIDE the prefix
                 "abzz"],                   # same 2-prefix only
    })
    out = (edit_distance_pairs(_ds(df), max_dist=3, prefix_len=4,
                               num_buckets=4)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    # candidates share 'abcd': docs 0,1,2 -> all three pairs survive;
    # doc 3 is invisible (blocking recall contract), doc 4 is too far
    assert list(map(tuple, out.itertuples(index=False))) == [
        (0, 1, 1), (0, 2, 2), (1, 2, 3)]


@settings(max_examples=6, deadline=None)
@given(data=st.data())
def test_resample_ffill_matches_duckdb(ray_session, data):
    from verify_ray.pipelines.sessions import resample_ffill

    n = data.draw(st.integers(min_value=1, max_value=30))
    ks = data.draw(st.lists(st.integers(min_value=0, max_value=3),
                            min_size=n, max_size=n))
    ts = data.draw(st.lists(st.integers(min_value=0, max_value=50),
                            min_size=n, max_size=n))
    vs = data.draw(st.lists(st.integers(min_value=-5, max_value=5),
                            min_size=n, max_size=n))
    step = data.draw(st.sampled_from([1, 7, 10]))
    df = pd.DataFrame({"k": np.asarray(ks, dtype=np.int64),
                       "t": np.asarray(ts, dtype=np.int64),
                       "v": np.asarray(vs, dtype=np.int64)})
    got = resample_ffill(_ds(df), "k", "t", "v", step,
                         num_buckets=4).to_pandas()
    if not len(got):
        # Ray's to_pandas drops columns on an all-empty dataset —
        # legitimately empty when every grid point precedes its key's
        # first event; just require the oracle agrees it's empty
        got = pd.DataFrame({"k": [], "grid_us": [], "val": []})
    got = (got.sort_values(["k", "grid_us"]).reset_index(drop=True))
    ref = duckdb.sql(f"""
        WITH e AS (SELECT k u, t, MAX(v) v FROM df GROUP BY k, t),
         spans AS (SELECT u, (MIN(t)//{step})*{step} g0,
                        (MAX(t)//{step})*{step} g1 FROM e GROUP BY u),
         grid AS (SELECT u, unnest(generate_series(g0, g1, {step})) g
                  FROM spans)
        SELECT grid.u k, grid.g grid_us, e.v val
        FROM grid ASOF JOIN e ON grid.u = e.u AND grid.g >= e.t
        ORDER BY k, grid_us""").df()
    assert got.values.tolist() == ref.values.tolist()
