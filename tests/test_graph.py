"""graph.pagerank_int: integer fixed-point PageRank."""

import numpy as np
import pyarrow as pa


def _edges(src, dst, blocks: int = 2):
    import ray.data as rd

    t = pa.table({"src": pa.array(src, type=pa.int64()),
                  "dst": pa.array(dst, type=pa.int64())})
    n = t.num_rows
    step = max(1, n // blocks)
    return rd.from_arrow([t.slice(i, step) for i in range(0, n, step)])


def _reference(src, dst, iters=3, damping=850, scale=1_000_000):
    src, dst = np.asarray(src), np.asarray(dst)
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {n: i for i, n in enumerate(nodes)}
    deg = {}
    for s in src:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: scale for n in nodes}
    base = (1000 - damping) * scale // 1000
    for _ in range(iters):
        c = {n: 0 for n in nodes}
        for s, d in zip(src, dst):
            c[d] += rank[s] // deg[s]
        rank = {n: base + damping * c[n] // 1000 for n in nodes}
    return rank, idx


def test_pagerank_matches_integer_reference(ray_session):
    from verify_ray.pipelines.graph import pagerank_int

    rng = np.random.default_rng(21)
    m = 300
    src = rng.integers(0, 40, m).astype(np.int64)
    dst = rng.integers(0, 40, m).astype(np.int64)
    out = (pagerank_int(_edges(src, dst, 4), iters=3, num_buckets=4)
           .to_pandas().sort_values("node").reset_index(drop=True))
    ref, _ = _reference(src, dst)
    assert out["rank"].tolist() == [ref[n] for n in out["node"]]
    assert len(out) == len(ref)


def test_pagerank_dangling_and_sink(ray_session):
    from verify_ray.pipelines.graph import pagerank_int

    # 0 -> 1 -> 2 (2 is dangling: its mass is NOT redistributed)
    out = (pagerank_int(_edges([0, 1], [1, 2], 1), iters=2,
                        num_buckets=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    ref, _ = _reference([0, 1], [1, 2], iters=2)
    assert out["rank"].tolist() == [ref[0], ref[1], ref[2]]
    # the sink accumulated more than the source
    assert ref[2] > ref[0]


def test_distinct_nodes_and_null_edges(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.graph import pagerank_int

    t = pa.table({"src": pa.array([1, None, 2], type=pa.int64()),
                  "dst": pa.array([2, 3, None], type=pa.int64())})
    out = (pagerank_int(rd.from_arrow(t), iters=1, num_buckets=2)
           .to_pandas())
    # only the (1 -> 2) edge survives; nodes = {1, 2}
    assert sorted(out["node"]) == [1, 2]


def _bfs_reference(src, dst, seeds, max_hops):
    """Driver-side BFS over the distinct edge set."""
    adj = {}
    for s, d in set(zip(src, dst)):
        adj.setdefault(s, set()).add(d)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(max_hops):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h + 1
                    nxt.add(v)
        frontier = nxt
    return dist


def test_bfs_hops_matches_reference(ray_session):
    from verify_ray.pipelines.graph import bfs_hops

    rng = np.random.default_rng(33)
    m = 400
    src = rng.integers(0, 60, m).astype(np.int64)
    dst = rng.integers(0, 60, m).astype(np.int64)
    out = (bfs_hops(_edges(src, dst, 4), seeds=[0, 1], max_hops=3,
                    num_buckets=4)
           .to_pandas().sort_values("node").reset_index(drop=True))
    ref = _bfs_reference(src, dst, [0, 1], 3)
    assert dict(zip(out["node"], out["hop"])) == ref


def test_bfs_hops_chain_and_unreachable(ray_session):
    from verify_ray.pipelines.graph import bfs_hops

    # 0 -> 1 -> 2 -> 3 -> 4; 9 isolated; max_hops caps the reach
    out = (bfs_hops(_edges([0, 1, 2, 3, 9], [1, 2, 3, 4, 9], 1),
                    seeds=[0], max_hops=2, num_buckets=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert dict(zip(out["node"], out["hop"])) == {0: 0, 1: 1, 2: 2}


def test_bfs_hops_parallel_edges_and_nulls(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.graph import bfs_hops

    t = pa.table({"src": pa.array([0, 0, 0, None, 5], type=pa.int64()),
                  "dst": pa.array([7, 7, 7, 8, None], type=pa.int64())})
    out = (bfs_hops(rd.from_arrow(t), seeds=[0], max_hops=3,
                    num_buckets=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    assert dict(zip(out["node"], out["hop"])) == {0: 0, 7: 1}


def test_resolve_roots_matches_reference(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.graph import resolve_roots

    child = np.arange(7, 150, dtype=np.int64)
    parent = child - (child % 7 + 1)
    edges = rd.from_arrow(pa.table({"child": pa.array(child),
                                    "parent": pa.array(parent)}))
    out = (resolve_roots(edges, rounds=6, num_buckets=4)
           .to_pandas().sort_values("node").reset_index(drop=True))

    def ref_root(u):
        while u >= 7:
            u = u - (u % 7 + 1)
        return u

    assert all(int(r.root) == ref_root(int(r.node))
               for r in out.itertuples())
    # roots map to themselves
    roots = out[out.node < 7]
    assert (roots.node == roots.root).all()


def test_resolve_roots_multi_parent_min_rule(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.graph import resolve_roots

    # node 5 has parents {2, 3}: the SMALLEST (2) wins; 2 -> 0
    t = pa.table({"child": pa.array([5, 5, 2], type=pa.int64()),
                  "parent": pa.array([3, 2, 0], type=pa.int64())})
    out = (resolve_roots(rd.from_arrow(t), rounds=4, num_buckets=2)
           .to_pandas().sort_values("node").reset_index(drop=True))
    m = dict(zip(out.node, out.root))
    assert m[5] == 0 and m[2] == 0 and m[0] == 0
    # 3 appears only as a parent: it is its own root
    assert m[3] == 3
