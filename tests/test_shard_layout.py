"""shard_layout — deterministic corpus shuffle into training shards."""

import numpy as np
import pandas as pd
import pyarrow as pa

from verify_ray.functions.hashing import md5_u64le
from verify_ray.pipelines.shuffle import shard_layout


def _brute(df, n_shards, key="doc_id"):
    k = df[key].astype(str)
    h = md5_u64le(pa.array(k.tolist()))
    out = df.assign(shard=(h % n_shards).astype(np.int64), _h=h, _k=k)
    out = out.sort_values(["shard", "_h", "_k"])
    out["pos"] = out.groupby("shard").cumcount()
    return out.drop(columns=["_h", "_k"])


def _run(df, n_shards):
    import ray.data as rd

    return shard_layout(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
        .materialize(), n_shards).to_pandas()


def test_matches_brute_force(ray_session):
    rng = np.random.default_rng(13)
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "source": rng.choice(["a", "b"], 300)})
    out = _run(df, 8).sort_values("doc_id").reset_index(drop=True)
    ref = (_brute(df, 8).sort_values("doc_id").reset_index(drop=True)
           [out.columns.tolist()])
    pd.testing.assert_frame_equal(out, ref.astype(out.dtypes.to_dict()))
    # every shard: contiguous 0..n-1 positions
    for s, g in out.groupby("shard"):
        assert sorted(g.pos) == list(range(len(g)))
    assert out.shard.nunique() == 8


def test_deterministic_and_parallelism_invariant(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)})
    t = pa.Table.from_pandas(df, preserve_index=False)
    a = shard_layout(rd.from_arrow(t).materialize(), 4).to_pandas()
    # different block structure -> identical layout
    many = rd.from_arrow(t).repartition(17).materialize()
    b = shard_layout(many, 4).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True))


def test_null_keys_dropped(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([1, None, 3], type=pa.int64())})
    out = shard_layout(rd.from_arrow(t).materialize(), 2).to_pandas()
    assert set(out.doc_id) == {1, 3}


def test_duckdb_window_parity(ray_session):
    duckdb = __import__("duckdb")
    df = pd.DataFrame({"doc_id": np.arange(150, dtype=np.int64)})
    out = (_run(df, 8).sort_values("doc_id").reset_index(drop=True)
           .astype("int64"))
    sql = duckdb.sql("""
        WITH k AS (SELECT doc_id,
                          md5_number_upper(CAST(doc_id AS VARCHAR)) AS h,
                          CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 8
                               AS BIGINT) AS shard
                   FROM df)
        SELECT doc_id, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard
                        ORDER BY h, CAST(doc_id AS VARCHAR)) - 1
                    AS BIGINT) AS pos
        FROM k ORDER BY doc_id""").df().astype("int64")
    pd.testing.assert_frame_equal(out, sql)


def test_epoch_readers_disjoint_and_complete(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from verify_ray.pipelines.shuffle import epoch_readers

    ds = rd.from_arrow(pa.table({
        "x": pa.array(range(1000), type=pa.int64())})).repartition(8)
    readers = epoch_readers(ds, 3)
    # streaming_split readers BARRIER across consumers: they must be
    # consumed CONCURRENTLY (sequential consumption deadlocks)
    import threading

    chunks = [[] for _ in readers]

    def drain(i, r):
        for b in r.iter_batches(batch_format="pyarrow"):
            chunks[i].extend(b["x"].to_pylist())

    threads = [threading.Thread(target=drain, args=(i, r))
               for i, r in enumerate(readers)]
    [t.start() for t in threads]
    [t.join(timeout=120) for t in threads]
    assert all(not t.is_alive() for t in threads)
    seen = [x for c in chunks for x in c]
    assert sorted(seen) == list(range(1000))  # disjoint AND complete
