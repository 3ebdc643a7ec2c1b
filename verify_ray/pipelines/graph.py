"""Iterative graph analytics over an edge-list Dataset.

``pagerank_int`` is the second member of the iterative family next to
``dedup.connected_components`` (min-label propagation): link-authority
scoring over a web/citation/reference graph — the classic quality
prior a crawl-derived training corpus wants (PageRank; Brin & Page
1998).  Everything is INTEGER fixed-point so the result is exactly
reproducible in SQL (the repo's integer-oracle policy — float
PageRank sums are order-dependent at the last ULP and can never
hash-match across engines)::

    rank_0(v)   = scale                       (one "unit" per node)
    share(e)    = rank_t(src e) // outdeg(src e)
    rank_t+1(v) = base + damping * Σ_{e into v} share(e) // 1000
    base        = (1000 - damping_permille) * scale // 1000

Integer-division remainders are deliberately DROPPED (deterministic
loss on both engines); dangling-node mass is NOT redistributed (the
simple variant — documented so the SQL oracle states the same rule).
Parallel edges count separately, like repeated links.

Distributed shape — node- and edge-count-agnostic (nothing
node-count-sized on the driver):

- nodes / out-degrees come from per-block ``np.unique`` partials
  through the hash exchange (distinct/count merge per bucket);
- each iteration is: ``joins.hash_join`` ranks onto edges by src
  (exchange-based, composes under iteration — CLAUDE.md: Ray Data's
  native join breaks when its input derives from a prior join), one
  streaming share map, a dst-keyed sum exchange, and a left join back
  onto the node list for no-inbound nodes;
- per-iteration results are ``.materialize()``d: each is consumed by
  the next iteration's join (multi-consumer guidance, CLAUDE.md).

Scale assumption (SURVEY §2.6): one node's edges fit a merge task —
salt mega-hub nodes upstream if a single dst's in-edges exceed a
worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _bucketed(col: np.ndarray, num_buckets: int) -> pa.Array:
    h = pd.util.hash_array(col)
    return pa.array((h % np.uint64(num_buckets)).astype(np.int64))


def distinct_nodes(edges_ds, src_col: str, dst_col: str,
                   num_buckets: int = 32):
    """Dataset of the distinct node ids appearing as src or dst."""
    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([("node", pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        vals = np.unique(np.concatenate([
            pc.cast(b[src_col], pa.int64()).drop_null()
            .to_numpy(zero_copy_only=False),
            pc.cast(b[dst_col], pa.int64()).drop_null()
            .to_numpy(zero_copy_only=False)]))
        return pa.table({"__b": _bucketed(vals, num_buckets),
                         "node": pa.array(vals)})

    def merge(t: pa.Table) -> pa.Table:
        u = np.unique(t.column("node").to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(u)})

    tagged = edges_ds.map_batches(partial, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, merge,
                               empty_schema=out_schema)


def _grouped_int_sum(ds, key_col: str, val_col: str, out_key: str,
                     out_val: str, num_buckets: int):
    """Exact int64 SUM(val) GROUP BY key through the exchange —
    map-side combine (per-block np.unique + add.at partials), one
    merge per bucket."""
    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([(out_key, pa.int64()),
                            (out_val, pa.int64())])

    def partial(b: pa.Table) -> pa.Table:
        k = pc.cast(b[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        v = pc.cast(b[val_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        u, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, v)
        return pa.table({"__b": _bucketed(u, num_buckets),
                         out_key: pa.array(u), out_val: pa.array(s)})

    def merge(t: pa.Table) -> pa.Table:
        k = t.column(out_key).to_numpy(zero_copy_only=False)
        v = t.column(out_val).to_numpy(zero_copy_only=False)
        u, inv = np.unique(k, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, v)
        return pa.table({out_key: pa.array(u), out_val: pa.array(s)})

    tagged = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, merge,
                               empty_schema=out_schema)


def pagerank_int(edges_ds, src_col: str = "src", dst_col: str = "dst",
                 iters: int = 3, damping_permille: int = 850,
                 scale: int = 1_000_000, num_buckets: int = 32):
    """Integer fixed-point PageRank (see module docstring).  Returns a
    Dataset (node int64, rank int64).  Null src/dst edges are dropped.
    """
    from .joins import hash_join

    def drop_null(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(pc.is_valid(b[src_col]),
                                pc.is_valid(b[dst_col])))

    edges = (edges_ds.select_columns([src_col, dst_col])
             .map_batches(drop_null, batch_format="pyarrow")
             .materialize())

    nodes = distinct_nodes(edges, src_col, dst_col,
                           num_buckets).materialize()

    def ones(b: pa.Table) -> pa.Table:
        return b.append_column(
            "__one", pa.array(np.ones(b.num_rows, dtype=np.int64)))

    outdeg = _grouped_int_sum(
        edges.map_batches(ones, batch_format="pyarrow"),
        src_col, "__one", "deg_src", "deg", num_buckets)

    # attach out-degree once; shipped columns: src, dst, deg
    edges_deg = hash_join(
        edges, outdeg, key=src_col, right_key="deg_src",
        left_values=[src_col, dst_col], right_values=["deg"],
        how="inner", num_buckets=num_buckets).materialize()

    base = (1000 - damping_permille) * scale // 1000

    def init_rank(b: pa.Table) -> pa.Table:
        return b.append_column(
            "rank", pa.array(np.full(b.num_rows, scale,
                                     dtype=np.int64)))

    ranks = nodes.map_batches(init_rank,
                              batch_format="pyarrow").materialize()

    for _ in range(iters):
        inflow = hash_join(
            edges_deg, ranks, key=src_col, right_key="node",
            left_values=[dst_col, "deg"], right_values=["rank"],
            how="inner", num_buckets=num_buckets)

        def share(b: pa.Table) -> pa.Table:
            r = b.column("rank").to_numpy(zero_copy_only=False)
            d = b.column("deg").to_numpy(zero_copy_only=False)
            return pa.table({
                dst_col: b[dst_col],
                "__share": pa.array(r // d)})

        sums = _grouped_int_sum(
            inflow.map_batches(share, batch_format="pyarrow"),
            dst_col, "__share", "node_in", "c", num_buckets)

        joined = hash_join(
            nodes, sums, key="node", right_key="node_in",
            left_values=["node"], right_values=["c"], how="left",
            num_buckets=num_buckets)

        def update(b: pa.Table) -> pa.Table:
            c = pc.fill_null(b["c"], 0).to_numpy(zero_copy_only=False)
            rank = base + damping_permille * c // 1000
            return pa.table({"node": b["node"],
                             "rank": pa.array(rank.astype(np.int64))})

        ranks = (joined.map_batches(update, batch_format="pyarrow")
                 .materialize())

    return ranks


def _pair_struct(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pack two int64 arrays into a sortable structured array — the
    vectorized pair-set idiom (sort / searchsorted / unique over pairs
    without a Python loop or a lossy bit-pack)."""
    out = np.empty(len(a), dtype=[("a", np.int64), ("b", np.int64)])
    out["a"], out["b"] = a, b
    return out


def triangle_count(edges_ds, src_col: str = "src", dst_col: str = "dst",
                   num_buckets: int = 32,
                   broadcast_nodes: int = 2_000_000) -> pd.DataFrame:
    """Distributed triangle counting over an undirected simple graph —
    the classic graph-quality / community-structure statistic (third
    member of the graph family next to pagerank_int and
    dedup.connected_components).  The edge list is canonicalized
    first: null endpoints and self-loops drop, direction is ignored,
    parallel edges collapse (COUNT DISTINCT pairs).  Returns a one-row
    DataFrame (n_edges, n_wedges, n_triangles), all int64 — exactly
    SQL-restatable (DISTINCT pairs + two self-joins).

    Scale shape — the node-iterator algorithm with DEGREE-ORDERED
    ORIENTATION (Schank & Wagner 2005): orient every canonical edge
    from its lower-(degree, id) endpoint to the higher one, so every
    out-neighborhood is O(√m) even at power-law hubs; each wedge
    (two out-edges of one node) is generated exactly once, and a
    triangle is a wedge whose closing pair is itself an edge.  Four
    exchanges, never an all-pairs product:

      1. pair-keyed distinct      (canonical edge set, map-side unique)
      2. degree sum               (map-side combine, one row per node)
      3. src-keyed wedge generate (per-node neighbor list -> C(d,2))
      4. pair-keyed wedge∩edge    (sorted structured-array searchsorted)

    Driver state: one int per bucket plus (below ``broadcast_nodes``
    distinct nodes) the broadcast degree table.  Degree attachment is
    size-routed like the dedup defaults: a node count within
    ``broadcast_nodes`` ships the (node, deg) arrays once via
    ``ray.put`` and each edge batch looks degrees up with two
    ``searchsorted`` calls — zero join shuffles; above the budget the
    attachment falls back to two ``joins.hash_join`` calls
    (exchange-based — composes under chaining).  Partitioning
    assumption (SURVEY §2.6): one ORIENTED out-neighborhood fits a
    merge task (≤ O(√m) by construction).
    """
    from ..stages.exchange import grouped_exchange_ds
    from .joins import hash_join

    # 1. canonical distinct edges (u < v)
    def canon(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[src_col]),
                             pc.is_valid(b[dst_col])))
        s = pc.cast(b[src_col], pa.int64()).to_numpy(zero_copy_only=False)
        d = pc.cast(b[dst_col], pa.int64()).to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        u, v = np.minimum(s, d), np.maximum(s, d)
        pairs = np.unique(_pair_struct(u, v))
        h = pd.util.hash_array(pairs["a"]) ^ pd.util.hash_array(pairs["b"])
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "u": pa.array(pairs["a"]), "v": pa.array(pairs["b"])})

    def dedup_pairs(t: pa.Table) -> pa.Table:
        pairs = np.unique(_pair_struct(
            t.column("u").to_numpy(zero_copy_only=False),
            t.column("v").to_numpy(zero_copy_only=False)))
        return pa.table({"u": pa.array(pairs["a"]),
                         "v": pa.array(pairs["b"])})

    edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    edges = grouped_exchange_ds(
        edges_ds.map_batches(canon, batch_format="pyarrow"),
        "__b", num_buckets, dedup_pairs,
        empty_schema=edge_schema).materialize()
    n_edges = edges.count()
    if n_edges == 0:
        return pd.DataFrame({"n_edges": pd.array([0], dtype="int64"),
                             "n_wedges": pd.array([0], dtype="int64"),
                             "n_triangles": pd.array([0], dtype="int64")})

    # 2. degrees over the canonical edge set
    def endpoints(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array(np.concatenate([u, v])),
            "__one": pa.array(np.ones(2 * len(u), dtype=np.int64))})

    deg = _grouped_int_sum(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        "n", "__one", "node", "deg", num_buckets).materialize()

    def _orient_from(du: np.ndarray, dv: np.ndarray, u, v) -> pa.Table:
        u_first = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_first, u, v)
        z = np.where(u_first, v, u)
        h = pd.util.hash_array(a)
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "a": pa.array(a), "z": pa.array(z)})

    if deg.count() <= broadcast_nodes:
        # small node set: ship (node, deg) once, look up per batch —
        # no join shuffles (the revenue_by_* broadcast pattern)
        import ray

        dt = deg.to_pandas()
        nodes_sorted = np.sort(dt["node"].to_numpy(np.int64))
        degs_sorted = dt.set_index("node").loc[nodes_sorted, "deg"] \
            .to_numpy(np.int64)
        deg_ref = ray.put((nodes_sorted, degs_sorted))

        def orient(b: pa.Table) -> pa.Table:
            nodes, degs = ray.get(deg_ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            du = degs[np.searchsorted(nodes, u)]
            dv = degs[np.searchsorted(nodes, v)]
            return _orient_from(du, dv, u, v)

        oriented_in = edges
    else:
        with_du = hash_join(edges, deg, key="u", right_key="node",
                            left_values=["u", "v"],
                            right_values=["deg"], how="inner",
                            num_buckets=num_buckets).materialize()
        oriented_in = hash_join(
            with_du, deg.map_batches(
                lambda b: b.rename_columns(["node2", "deg2"]),
                batch_format="pyarrow"),
            key="v", right_key="node2",
            left_values=["u", "v", "deg"],
            right_values=["deg2"], how="inner",
            num_buckets=num_buckets)

        def orient(b: pa.Table) -> pa.Table:
            return _orient_from(
                b.column("deg").to_numpy(zero_copy_only=False),
                b.column("deg2").to_numpy(zero_copy_only=False),
                b.column("u").to_numpy(zero_copy_only=False),
                b.column("v").to_numpy(zero_copy_only=False))

    def wedges_of(t: pa.Table) -> pa.Table:
        # lexsort by (source, neighbor): within-group neighbor order is
        # ascending, so enumerated pairs come out canonical (x < y) —
        # neighbors are distinct per source (edges are distinct)
        a = t.column("a").to_numpy(zero_copy_only=False)
        z = t.column("z").to_numpy(zero_copy_only=False)
        order = np.lexsort((z, a))
        a, z = a[order], z[order]
        _, start = np.unique(a, return_index=True)
        cnt = np.diff(np.append(start, len(a)))
        # repeat/arange pair enumeration (joins.py idiom, no per-group
        # loop): row at within-group position p pairs with the
        # (c - 1 - p) rows after it
        cnt_row = np.repeat(cnt, cnt)
        pos = np.arange(len(a)) - np.repeat(start, cnt)
        n_after = cnt_row - 1 - pos
        total = int(n_after.sum())
        if total == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        first = np.repeat(np.arange(len(a)), n_after)
        csum = np.concatenate(([0], np.cumsum(n_after)))
        k = np.arange(total) - np.repeat(csum[:-1], n_after)
        second = first + 1 + k
        return pa.table({"x": pa.array(z[first]),
                         "y": pa.array(z[second])})

    wedge_schema = pa.schema([("x", pa.int64()), ("y", pa.int64())])
    wedges = grouped_exchange_ds(
        oriented_in.map_batches(orient, batch_format="pyarrow"),
        "__b", num_buckets, wedges_of, empty_schema=wedge_schema)

    # 4. wedge ∩ edge on the canonical pair key
    def tag_kind(kind: int, xc: str, yc: str):
        def fn(b: pa.Table) -> pa.Table:
            x = b.column(xc).to_numpy(zero_copy_only=False)
            y = b.column(yc).to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(x) ^ pd.util.hash_array(y)
            return pa.table({
                "__b": pa.array(
                    (h % np.uint64(num_buckets)).astype(np.int64)),
                "x": pa.array(x), "y": pa.array(y),
                "k": pa.array(np.full(len(x), kind, dtype=np.int64))})
        return fn

    mixed = (wedges.map_batches(tag_kind(0, "x", "y"),
                                batch_format="pyarrow")
             .union(edges.map_batches(tag_kind(1, "u", "v"),
                                      batch_format="pyarrow")))

    def close_count(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        w = _pair_struct(x[k == 0], y[k == 0])
        e = np.sort(_pair_struct(x[k == 1], y[k == 1]))
        if len(w) == 0 or len(e) == 0:
            tri = 0
        else:
            i = np.searchsorted(e, w)
            hit = i < len(e)
            hit[hit] = e[i[hit]] == w[hit]
            tri = int(hit.sum())
        return pa.table({"n_wedges": pa.array([len(w)], pa.int64()),
                         "n_triangles": pa.array([tri], pa.int64())})

    from ..stages.exchange import grouped_exchange
    counts = grouped_exchange(mixed, "__b", num_buckets, close_count)
    cdf = counts.to_pandas()
    return pd.DataFrame({
        "n_edges": pd.array([n_edges], dtype="int64"),
        "n_wedges": pd.array([int(cdf["n_wedges"].sum())], dtype="int64"),
        "n_triangles": pd.array([int(cdf["n_triangles"].sum())],
                                dtype="int64")})


def cooccurrence_edges(ds, group_col: str, item_col: str,
                       num_buckets: int = 32):
    """Co-occurrence edge extraction (market-basket -> graph): one
    canonical undirected edge (x < y, int64) per pair of DISTINCT
    items sharing a group (order, session, document).  Parallel edges
    from different groups are emitted as-is — feed ``triangle_count``
    (which dedups) or count them for co-occurrence weights.

    One group-keyed exchange; per-group pair enumeration is the
    repeat/arange pattern (no per-group loop), so a group of k items
    emits C(k, 2) rows — the per-task bound is the largest group's
    pair count (SURVEY §2.6: cap or split mega-groups upstream if a
    single group's C(k,2) exceeds a worker).
    """
    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([("x", pa.int64()), ("y", pa.int64())])

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[item_col])))
        g = pc.cast(b[group_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        it = pc.cast(b[item_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        # map-side dedup of (group, item) repeats
        pairs = np.unique(_pair_struct(g, it))
        h = pd.util.hash_array(pairs["a"])
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "g": pa.array(pairs["a"]), "i": pa.array(pairs["b"])})

    def pairs_of(t: pa.Table) -> pa.Table:
        gi = np.unique(_pair_struct(
            t.column("g").to_numpy(zero_copy_only=False),
            t.column("i").to_numpy(zero_copy_only=False)))
        g, it = gi["a"], gi["b"]  # sorted by (g, item): canonical pairs
        _, start = np.unique(g, return_index=True)
        cnt = np.diff(np.append(start, len(g)))
        cnt_row = np.repeat(cnt, cnt)
        pos = np.arange(len(g)) - np.repeat(start, cnt)
        n_after = cnt_row - 1 - pos
        total = int(n_after.sum())
        if total == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64())})
        first = np.repeat(np.arange(len(g)), n_after)
        csum = np.concatenate(([0], np.cumsum(n_after)))
        k = np.arange(total) - np.repeat(csum[:-1], n_after)
        return pa.table({"x": pa.array(it[first]),
                         "y": pa.array(it[first + 1 + k])})

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, pairs_of,
                               empty_schema=out_schema)


def _grouped_int_min(ds, key_col: str, val_col: str, out_key: str,
                     out_val: str, num_buckets: int):
    """Exact int64 MIN(val) GROUP BY key through the exchange —
    map-side combine (per-block unique + minimum.at partials), one
    merge per bucket (same shape as ``_grouped_int_sum``)."""
    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([(out_key, pa.int64()),
                            (out_val, pa.int64())])

    def reduce_min(k: np.ndarray, v: np.ndarray):
        u, inv = np.unique(k, return_inverse=True)
        m = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(m, inv, v)
        return u, m

    def partial(b: pa.Table) -> pa.Table:
        u, m = reduce_min(
            pc.cast(b[key_col], pa.int64()).to_numpy(
                zero_copy_only=False),
            pc.cast(b[val_col], pa.int64()).to_numpy(
                zero_copy_only=False))
        return pa.table({"__b": _bucketed(u, num_buckets),
                         out_key: pa.array(u), out_val: pa.array(m)})

    def merge(t: pa.Table) -> pa.Table:
        u, m = reduce_min(
            t.column(out_key).to_numpy(zero_copy_only=False),
            t.column(out_val).to_numpy(zero_copy_only=False))
        return pa.table({out_key: pa.array(u), out_val: pa.array(m)})

    tagged = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, merge,
                               empty_schema=out_schema)


def bfs_hops(edges_ds, seeds, src_col: str = "src",
             dst_col: str = "dst", max_hops: int = 3,
             num_buckets: int = 32):
    """Multi-source shortest-hop BFS over a directed graph — hop
    distance from a seed set, the crawl-depth / link-distance quality
    prior a web corpus wants next to ``pagerank_int`` (e.g. "distance
    from a trusted seed list" à la TrustRank, Gyöngyi et al. 2004).
    Returns a Dataset ``(node int64, hop int64)`` containing exactly
    the nodes reachable within ``max_hops`` edges of any seed (seeds
    themselves at hop 0); unreached nodes are absent.  Null-endpoint
    edges drop; parallel edges collapse first (DISTINCT src→dst, one
    pair-keyed exchange) so fan-out is bounded by the simple graph.

    Semantics match the SQL recursive-CTE restatement::

        WITH RECURSIVE walk(node, hop) AS (
          SELECT seed, 0 UNION
          SELECT e.dst, w.hop+1 FROM walk w JOIN e ON e.src = w.node
          WHERE w.hop < max_hops)
        SELECT node, MIN(hop) GROUP BY node

    Distributed shape — level-synchronous frontier relaxation, the
    Pregel/BSP pattern (Malewicz et al. 2010), nothing
    node-count-sized on the driver:

    - ``dist`` is a Dataset (node, hop); after iteration *h* it holds
      the true shortest hop for every node within *h* hops (min-merge
      keeps the earliest level, so ``hop == h`` rows ARE the frontier
      — no separate visited set);
    - each iteration: frontier = ``dist`` filtered to ``hop == h``
      (streaming filter), one ``joins.hash_join`` of the distinct
      edge list onto the frontier by src (exchange-based — composes
      under iteration, CLAUDE.md), a streaming map to (dst, h+1),
      union with ``dist``, and one node-keyed min exchange;
    - per-iteration ``dist`` is ``.materialize()``d (consumed by both
      the next filter and the next union — multi-consumer, CLAUDE.md).

    ``seeds`` is a small driver-side list of node ids (a trusted seed
    list is manifest-sized by nature); for a dataset-sized seed set,
    map it to (node, hop=0) rows and union before the first exchange.

    Partitioning assumption (SURVEY §2.6): one node's out-edges fit a
    merge task — salt mega-hubs upstream.
    """
    import ray.data

    from ..stages.exchange import grouped_exchange_ds
    from .joins import hash_join

    # distinct simple edges (same pair-keyed dedup as triangle_count,
    # but DIRECTED — no canonicalization, self-loops kept: they are
    # harmless under min-relaxation and the SQL restatement keeps them)
    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[src_col]),
                             pc.is_valid(b[dst_col])))
        s = pc.cast(b[src_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = pc.cast(b[dst_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        pairs = np.unique(_pair_struct(s, d))
        h = (pd.util.hash_array(pairs["a"])
             ^ pd.util.hash_array(pairs["b"]))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "src": pa.array(pairs["a"]), "dst": pa.array(pairs["b"])})

    def dedup_pairs(t: pa.Table) -> pa.Table:
        pairs = np.unique(_pair_struct(
            t.column("src").to_numpy(zero_copy_only=False),
            t.column("dst").to_numpy(zero_copy_only=False)))
        return pa.table({"src": pa.array(pairs["a"]),
                         "dst": pa.array(pairs["b"])})

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    edges = grouped_exchange_ds(
        edges_ds.map_batches(tag, batch_format="pyarrow"),
        "__b", num_buckets, dedup_pairs,
        empty_schema=edge_schema).materialize()

    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    dist = ray.data.from_arrow(pa.table({
        "node": pa.array(seed_arr),
        "hop": pa.array(np.zeros(len(seed_arr), dtype=np.int64)),
    })).materialize()

    for h in range(max_hops):
        def is_frontier(b: pa.Table, _h=h) -> pa.Table:
            return b.filter(pc.equal(b["hop"], pa.scalar(_h)))

        frontier = dist.map_batches(is_frontier,
                                    batch_format="pyarrow")
        reached = hash_join(
            edges, frontier, key="src", right_key="node",
            left_values=["dst"], right_values=[], how="semi",
            num_buckets=num_buckets)

        def step(b: pa.Table, _h=h) -> pa.Table:
            d = np.unique(pc.cast(b["dst"], pa.int64()).to_numpy(
                zero_copy_only=False))
            return pa.table({
                "node": pa.array(d),
                "hop": pa.array(np.full(len(d), _h + 1,
                                        dtype=np.int64))})

        nxt = reached.map_batches(step, batch_format="pyarrow")
        dist = _grouped_int_min(dist.union(nxt), "node", "hop",
                                "node", "hop",
                                num_buckets).materialize()

    return dist


def resolve_roots(edges_ds, child_col: str = "child",
                  parent_col: str = "parent", rounds: int = 16,
                  num_buckets: int = 32):
    """Forest ancestry resolution: for every node of a parent-pointer
    forest, find its ROOT — the hierarchy-flattening primitive
    (org-chart rollups, thread→conversation roots, file-system
    ancestors) via POINTER JUMPING (ptr ← ptr[ptr], Wyllie 1979):
    each round doubles the distance every pointer covers, so a depth-D
    forest resolves in ⌈log₂ D⌉ rounds of self-joins instead of D
    sequential steps — the reason this beats naive iteration at scale.
    ``rounds`` must satisfy ``2^rounds ≥ max depth`` (16 covers
    65 k-deep chains).

    Nodes with no parent edge are roots (they map to themselves);
    multi-parent children take their SMALLEST parent (deterministic
    forest-ization, stated in the oracle).  Null endpoints drop.
    Returns a Dataset ``(node int64, root int64)``.

    Distributed shape: parent edges dedupe to min-parent through one
    child-keyed min exchange; each jump round is ONE
    ``joins.hash_join`` of the pointer table onto itself (left ptr →
    right node, exchange-based — composes under iteration) followed
    by a streaming coalesce; per-round results ``.materialize()``
    (multi-consumer, CLAUDE.md).  Nothing node-count-sized on the
    driver.
    """
    from .joins import hash_join

    # min-parent per child (deterministic forest), null-safe
    def canon(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[child_col]),
                             pc.is_valid(b[parent_col])))
        return pa.table({
            "c": pc.cast(b[child_col], pa.int64()),
            "p": pc.cast(b[parent_col], pa.int64())})

    edges = (edges_ds.map_batches(canon, batch_format="pyarrow")
             .materialize())
    parent_of = _grouped_int_min(edges, "c", "p", "node", "ptr",
                                 num_buckets).materialize()

    # node universe = children ∪ parents; roots point to themselves
    nodes = distinct_nodes(edges, "c", "p", num_buckets)
    ptr = hash_join(
        nodes, parent_of, key="node", right_key="node",
        left_values=["node"], right_values=["ptr"], how="left",
        num_buckets=num_buckets)

    def coalesce_self(b: pa.Table) -> pa.Table:
        n = pc.cast(b["node"], pa.int64())
        return pa.table({"node": n,
                         "ptr": pc.coalesce(
                             pc.cast(b["ptr"], pa.int64()), n)})

    ptr = ptr.map_batches(coalesce_self,
                          batch_format="pyarrow").materialize()

    def rename_ptr(b: pa.Table) -> pa.Table:
        return pa.table({"node2": b["node"], "root2": b["ptr"]})

    for _ in range(rounds):
        rhs = ptr.map_batches(rename_ptr, batch_format="pyarrow")
        jumped = hash_join(
            ptr, rhs, key="ptr", right_key="node2",
            left_values=["node", "ptr"], right_values=["root2"],
            how="left", num_buckets=num_buckets)

        def advance(b: pa.Table) -> pa.Table:
            return pa.table({
                "node": pc.cast(b["node"], pa.int64()),
                "ptr": pc.coalesce(pc.cast(b["root2"], pa.int64()),
                                   pc.cast(b["ptr"], pa.int64()))})

        ptr = jumped.map_batches(advance,
                                 batch_format="pyarrow").materialize()

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "root": b["ptr"]})

    return ptr.map_batches(finish, batch_format="pyarrow")


def degree_assortativity_surface(edges_ds, x_col: str = "x",
                                 y_col: str = "y",
                                 num_buckets: int = 32) -> pd.DataFrame:
    """DEGREE-ASSORTATIVITY integer surface of an undirected simple
    graph — the mixing audit (do hubs connect to hubs?) behind graph
    sanity checks on co-occurrence graphs: over the DISTINCT edge set
    (parallel edges from ``cooccurrence_edges`` are deduped first),
    emit one row ``(m, sum_prod, sum_deg, sum_sq)`` where per edge
    (u, v) with distinct-neighbor degrees d_u, d_v the sums are
    Σ d_u·d_v, Σ (d_u + d_v), Σ (d_u² + d_v²) — exact BIGINT; Pearson
    assortativity r derives as
    [sum_prod/m − (sum_deg/2m)²] / [sum_sq/2m − (sum_deg/2m)²].

    Scale shape: edge dedup is one pair-hashed exchange; degrees are
    per-batch (node, cnt) partials through a node-keyed exchange
    (Dataset-resident); each degree attaches to its edges via the
    composable :func:`pipelines.joins.hash_join` (one exchange per
    side); the final reduce is a 4-scalar per-batch partial.
    """
    from ..stages.exchange import grouped_exchange, grouped_exchange_ds
    from .joins import hash_join

    edge_schema = pa.schema([("x", pa.int64()), ("y", pa.int64())])
    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def tag_edges(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[x_col]), pc.is_valid(b[y_col])))
        x = pc.cast(b[x_col], pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(b[y_col], pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(x, y), np.maximum(x, y)  # canonical x < y
        keep = lo != hi  # drop self-loops
        lo, hi = lo[keep], hi[keep]
        pairs = np.unique(_pair_struct(lo, hi))  # map-side dedup
        h = pd.util.hash_array(pairs["a"]) ^ pd.util.hash_array(pairs["b"])
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "x": pa.array(pairs["a"]), "y": pa.array(pairs["b"])})

    def dedup(t: pa.Table) -> pa.Table:
        pairs = np.unique(_pair_struct(
            t.column("x").to_numpy(zero_copy_only=False),
            t.column("y").to_numpy(zero_copy_only=False)))
        return pa.table({"x": pa.array(pairs["a"]),
                         "y": pa.array(pairs["b"])}).cast(edge_schema)

    E = grouped_exchange_ds(
        edges_ds.map_batches(tag_edges, batch_format="pyarrow"),
        "__b", num_buckets, dedup, empty_schema=edge_schema).materialize()

    def node_partial(b: pa.Table) -> pa.Table:
        nodes = np.concatenate([
            b.column("x").to_numpy(zero_copy_only=False),
            b.column("y").to_numpy(zero_copy_only=False)])
        un, cnt = np.unique(nodes, return_counts=True)
        h = pd.util.hash_array(un)
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "node": pa.array(un), "deg": pa.array(cnt.astype(np.int64))})

    def sum_deg(t: pa.Table) -> pa.Table:
        n = t.column("node").to_numpy(zero_copy_only=False)
        d = t.column("deg").to_numpy(zero_copy_only=False)
        un, inv = np.unique(n, return_inverse=True)
        out = np.zeros(len(un), dtype=np.int64)
        np.add.at(out, inv, d)
        return pa.table({"node": pa.array(un),
                         "deg": pa.array(out)}).cast(deg_schema)

    D = grouped_exchange_ds(
        E.map_batches(node_partial, batch_format="pyarrow"),
        "__b", num_buckets, sum_deg, empty_schema=deg_schema).materialize()

    def rename(to):
        def f(b: pa.Table) -> pa.Table:
            return b.rename_columns(["node", to])
        return f

    with_dx = hash_join(E, D.map_batches(rename("dx"),
                                         batch_format="pyarrow"),
                        key="x", right_key="node",
                        left_values=["x", "y"], right_values=["dx"],
                        num_buckets=num_buckets)
    with_both = hash_join(with_dx,
                          D.map_batches(rename("dy"),
                                        batch_format="pyarrow"),
                          key="y", right_key="node",
                          left_values=["x", "y", "dx"],
                          right_values=["dy"],
                          num_buckets=num_buckets)

    def scalar_partial(b: pa.Table) -> pa.Table:
        dx = b.column("dx").to_numpy(zero_copy_only=False)
        dy = b.column("dy").to_numpy(zero_copy_only=False)
        return pa.table({
            "m": pa.array([b.num_rows], pa.int64()),
            "sum_prod": pa.array([int((dx * dy).sum())], pa.int64()),
            "sum_deg": pa.array([int((dx + dy).sum())], pa.int64()),
            "sum_sq": pa.array([int((dx * dx + dy * dy).sum())],
                               pa.int64())})

    parts = with_both.map_batches(scalar_partial,
                                  batch_format="pyarrow").to_pandas()
    tot = parts.sum() if len(parts) else None
    row = ({"m": 0, "sum_prod": 0, "sum_deg": 0, "sum_sq": 0}
           if tot is None else
           {c: int(tot[c]) for c in ("m", "sum_prod", "sum_deg",
                                     "sum_sq")})
    return pd.DataFrame([row]).astype("int64")


def _kcore_local(x: np.ndarray, y: np.ndarray, k: int
                 ) -> pd.DataFrame:
    """Vectorized in-memory peel over deduped edges (driver-budget
    arm): O(rounds · E) numpy, no Ray round-trips."""
    while len(x):
        nodes = np.concatenate([x, y])
        u, c = np.unique(nodes, return_counts=True)
        gone = u[c < k]
        if not len(gone):
            out = pd.DataFrame({"node": u, "deg_core": c})
            return (out.sort_values("node").reset_index(drop=True)
                    .astype("int64"))
        bad = np.isin(x, gone) | np.isin(y, gone)
        x, y = x[~bad], y[~bad]
    return pd.DataFrame({"node": pd.Series(dtype="int64"),
                         "deg_core": pd.Series(dtype="int64")})


def kcore(edges_ds, k: int, num_buckets: int = 32,
          max_rounds: int = 64,
          driver_budget_edges: int = 5_000_000) -> pd.DataFrame:
    """k-CORE decomposition membership: the maximal subgraph in which
    every node keeps degree ≥ ``k`` — the density filter behind
    community seeding and spam-graph pruning (peeling: repeatedly
    delete nodes of degree < k until a fixpoint; the survivor set is
    unique regardless of deletion order, so the result is
    deterministic).  Input is an undirected edge Dataset ``(x, y)``;
    parallel edges are deduped first (degree = distinct neighbors).
    Returns ``(node, deg_core)`` — survivors with their in-core
    degree — sorted by node.

    Scale shape: edges stay in the object store for the whole peel;
    each round is ONE node-keyed exchange computing degrees whose
    merge emits ONLY the violators (deg < k) — a shrinking,
    usually-small frame — plus one broadcast (``ray.put`` of the
    sorted violator ids) + vectorized searchsorted edge filter.
    Rounds are data-bounded (≤ peel depth, logarithmic-ish on real
    graphs); ``max_rounds`` is the runaway guard.  The final exchange
    emits the core-sized (node, degree) result once, after
    convergence.  Deduped edge sets ≤ ``driver_budget_edges`` route
    to a vectorized in-memory peel instead (the connected-components
    ``pair_budget`` idiom — per-round exchange overhead dominates
    small graphs; both arms are fixpoint-identical and tested equal).
    """
    import ray

    from ..stages.exchange import grouped_exchange

    pair_schema = pa.schema([("x", pa.int64()), ("y", pa.int64())])

    def dedup_tag(b: pa.Table) -> pa.Table:
        x = pc.cast(b["x"], pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(b["y"], pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(x, y), np.maximum(x, y)
        keep = lo != hi  # self-loops never contribute to k-core degree
        pairs = np.unique(_pair_struct(lo[keep], hi[keep]))
        return pa.table({
            "__b": _bucketed(pairs["a"] + pairs["b"], num_buckets),
            "x": pa.array(pairs["a"]), "y": pa.array(pairs["b"])})

    def dedup_merge(t: pa.Table) -> pa.Table:
        pairs = np.unique(_pair_struct(
            t.column("x").to_numpy(zero_copy_only=False),
            t.column("y").to_numpy(zero_copy_only=False)))
        return pa.table({"x": pa.array(pairs["a"]),
                         "y": pa.array(pairs["b"])})

    from ..stages.exchange import grouped_exchange_ds

    edges = grouped_exchange_ds(
        edges_ds.map_batches(dedup_tag, batch_format="pyarrow"),
        "__b", num_buckets, dedup_merge,
        empty_schema=pair_schema).materialize()

    # size routing (the connected-components pair_budget idiom): a
    # deduped edge set under the budget peels vectorized in-memory —
    # each distributed round costs a full exchange of fixed overhead,
    # which dominates below millions of edges
    n_edges = edges.count()
    if n_edges <= driver_budget_edges:
        if n_edges == 0:
            return pd.DataFrame({"node": pd.Series(dtype="int64"),
                                 "deg_core": pd.Series(dtype="int64")})
        t = pa.concat_tables(
            [pa.Table.from_pydict(b) if isinstance(b, dict) else b
             for b in edges.iter_batches(batch_format="pyarrow",
                                         batch_size=None)])
        return _kcore_local(
            t.column("x").to_numpy(zero_copy_only=False),
            t.column("y").to_numpy(zero_copy_only=False), k)

    def deg_partial(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        n = np.concatenate([x, y])
        u, c = np.unique(n, return_counts=True)
        return pa.table({"__b": _bucketed(u, num_buckets),
                         "node": pa.array(u),
                         "deg": pa.array(c.astype(np.int64))})

    def merge_deg(emit_all: bool):
        def merge(t: pa.Table) -> pa.Table:
            nd = t.column("node").to_numpy(zero_copy_only=False)
            dg = t.column("deg").to_numpy(zero_copy_only=False)
            u, inv = np.unique(nd, return_inverse=True)
            s = np.zeros(len(u), dtype=np.int64)
            np.add.at(s, inv, dg)
            keep = np.ones(len(u), bool) if emit_all else s < k
            return pa.table({"node": pa.array(u[keep]),
                             "deg": pa.array(s[keep])})
        return merge

    empty = pd.DataFrame({"node": pd.Series(dtype="int64"),
                          "deg_core": pd.Series(dtype="int64")})
    for _ in range(max_rounds):
        degs = edges.map_batches(deg_partial, batch_format="pyarrow")
        removed = grouped_exchange(degs, "__b", num_buckets,
                                   merge_deg(emit_all=False))
        if removed is None or removed.num_rows == 0:
            break
        gone = np.sort(removed.column("node").to_numpy(
            zero_copy_only=False))
        gone_ref = ray.put(gone)

        def drop(b: pa.Table, ref=gone_ref) -> pa.Table:
            import ray as _ray

            g = _ray.get(ref)
            x = b.column("x").to_numpy(zero_copy_only=False)
            y = b.column("y").to_numpy(zero_copy_only=False)
            ix = np.searchsorted(g, x)
            iy = np.searchsorted(g, y)
            bad = ((ix < len(g)) & (g[np.minimum(ix, len(g) - 1)] == x)) \
                | ((iy < len(g)) & (g[np.minimum(iy, len(g) - 1)] == y))
            return b.filter(pa.array(~bad))

        edges = edges.map_batches(drop,
                                  batch_format="pyarrow").materialize()
        if edges.count() == 0:
            return empty
    else:
        raise RuntimeError(
            f"kcore did not converge in {max_rounds} rounds — raise "
            "max_rounds (peel depth exceeds the guard)")

    degs = edges.map_batches(deg_partial, batch_format="pyarrow")
    core = grouped_exchange(degs, "__b", num_buckets,
                            merge_deg(emit_all=True))
    if core is None or core.num_rows == 0:
        return empty
    out = core.to_pandas().rename(columns={"deg": "deg_core"})
    return (out.sort_values("node").reset_index(drop=True)
            .astype("int64"))


def association_rules(ds, group_col: str, item_col: str,
                      min_support: int = 2,
                      num_buckets: int = 32) -> pd.DataFrame:
    """Market-basket ASSOCIATION-RULE surface: for every unordered
    item pair co-occurring in ≥ ``min_support`` baskets, the exact
    integer rule statistics — ``c_ab`` (pair support), ``c_x``/``c_y``
    (item supports), permille confidences ``conf_xy_pm = ⌊1000·c_ab/
    c_x⌋`` (x⇒y) and ``conf_yx_pm``, and the cross-multiplied lift
    pair ``(lift_num, lift_den) = (c_ab·N, c_x·c_y)`` (lift > 1 ⟺
    lift_num > lift_den — no float division anywhere).  ``N`` is the
    basket count.  Supports are basket-level (an item twice in one
    basket counts once).  Returns one row per rule pair sorted by
    ``(x, y)``.

    Scale shape: per-group pair enumeration reuses the
    ``cooccurrence_edges`` exchange (C(k,2) per basket is the
    documented per-task bound); pair counting is a second pair-keyed
    exchange whose merge FILTERS to ``min_support`` before anything
    reaches the driver (frequent pairs are output-sized by
    definition); item supports + the basket count reduce through a
    basket-keyed exchange to a catalog-sized partial frame (same
    driver-merge contract as the token top-k family).
    """
    from ..stages.exchange import grouped_exchange

    edges = cooccurrence_edges(ds, group_col, item_col,
                               num_buckets=num_buckets)

    def pair_tag(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False)
        y = b.column("y").to_numpy(zero_copy_only=False)
        pairs, cnt = np.unique(_pair_struct(x, y), return_counts=True)
        return pa.table({"__b": _bucketed(pairs["a"] + pairs["b"],
                                          num_buckets),
                         "x": pa.array(pairs["a"]),
                         "y": pa.array(pairs["b"]),
                         "c": pa.array(cnt.astype(np.int64))})

    def pair_merge(t: pa.Table) -> pa.Table:
        pairs = _pair_struct(t.column("x").to_numpy(zero_copy_only=False),
                             t.column("y").to_numpy(zero_copy_only=False))
        c = t.column("c").to_numpy(zero_copy_only=False)
        u, inv = np.unique(pairs, return_inverse=True)
        s = np.zeros(len(u), dtype=np.int64)
        np.add.at(s, inv, c)
        keep = s >= min_support
        return pa.table({"x": pa.array(u["a"][keep]),
                         "y": pa.array(u["b"][keep]),
                         "c_ab": pa.array(s[keep])})

    rules = grouped_exchange(
        edges.map_batches(pair_tag, batch_format="pyarrow"),
        "__b", num_buckets, pair_merge)
    cols = ["x", "y", "c_ab", "c_x", "c_y", "conf_xy_pm",
            "conf_yx_pm", "lift_num", "lift_den"]
    if rules is None or rules.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})

    # item supports + basket count: baskets co-locate by group hash, so
    # per-bucket (item, n_baskets_with_item) partials and the bucket's
    # distinct-basket count (sentinel item = -1) are both exact
    def gi_tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[item_col])))
        g = pc.cast(b[group_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        it = pc.cast(b[item_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        pairs = np.unique(_pair_struct(g, it))
        return pa.table({"__b": _bucketed(pairs["a"], num_buckets),
                         "g": pa.array(pairs["a"]),
                         "i": pa.array(pairs["b"])})

    def support_merge(t: pa.Table) -> pa.Table:
        gi = np.unique(_pair_struct(
            t.column("g").to_numpy(zero_copy_only=False),
            t.column("i").to_numpy(zero_copy_only=False)))
        items, cnt = np.unique(gi["b"], return_counts=True)
        n_baskets = len(np.unique(gi["a"]))
        return pa.table({
            "i": pa.array(np.r_[items, [-1]]),
            "c": pa.array(np.r_[cnt.astype(np.int64), [n_baskets]])})

    sup = grouped_exchange(
        ds.map_batches(gi_tag, batch_format="pyarrow"),
        "__b", num_buckets, support_merge).to_pandas()
    sup = sup.groupby("i", as_index=False)["c"].sum()
    n_baskets = int(sup.loc[sup.i == -1, "c"].sum())
    item_c = dict(zip(sup.i.to_numpy(), sup.c.to_numpy()))

    df = rules.to_pandas()
    cx = df.x.map(item_c).to_numpy(np.int64)
    cy = df.y.map(item_c).to_numpy(np.int64)
    cab = df.c_ab.to_numpy(np.int64)
    out = pd.DataFrame({
        "x": df.x, "y": df.y, "c_ab": cab, "c_x": cx, "c_y": cy,
        "conf_xy_pm": 1000 * cab // cx,
        "conf_yx_pm": 1000 * cab // cy,
        "lift_num": cab * n_baskets,
        "lift_den": cx * cy})
    return (out.sort_values(["x", "y"]).reset_index(drop=True)
            .astype("int64"))


def local_clustering(edges_ds, src_col: str = "src",
                     dst_col: str = "dst", num_buckets: int = 32,
                     broadcast_nodes: int = 2_000_000) -> pd.DataFrame:
    """PER-NODE triangle participation — the local-clustering surface
    (``coeff = 2·n_tri / (deg·(deg−1))`` derives consumer-side): for
    every node of the canonicalized simple graph, its degree and the
    number of triangles through it.  The hub-vs-community telescope
    that the global :func:`triangle_count` scalar cannot resolve.
    Returns ``(node, deg, n_tri)`` sorted by node (``n_tri = 0`` for
    triangle-free nodes).

    Scale shape mirrors ``triangle_count`` (degree-ordered
    orientation, Schank & Wagner 2005) with the wedge CENTER carried
    through: canonical-edge exchange → degree sum → oriented wedge
    generation (out-neighborhoods O(√m) by orientation) → pair-keyed
    wedge∩edge intersection emitting THREE (node, 1) rows per
    triangle → node-keyed count sum.  Degree attachment is
    size-routed exactly like triangle_count (broadcast ≤
    ``broadcast_nodes``, hash_join beyond).  The output itself is
    node-cardinality — per-node surfaces are driver-sized by
    definition; stream the Dataset variants of the underlying stages
    for corpus-scale sinks.
    """
    import ray

    from ..stages.exchange import grouped_exchange, grouped_exchange_ds
    from .joins import hash_join

    def canon(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[src_col]),
                             pc.is_valid(b[dst_col])))
        s = pc.cast(b[src_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = pc.cast(b[dst_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        u, v = np.minimum(s, d), np.maximum(s, d)
        pairs = np.unique(_pair_struct(u, v))
        h = pd.util.hash_array(pairs["a"]) ^ pd.util.hash_array(
            pairs["b"])
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "u": pa.array(pairs["a"]), "v": pa.array(pairs["b"])})

    def dedup_pairs(t: pa.Table) -> pa.Table:
        pairs = np.unique(_pair_struct(
            t.column("u").to_numpy(zero_copy_only=False),
            t.column("v").to_numpy(zero_copy_only=False)))
        return pa.table({"u": pa.array(pairs["a"]),
                         "v": pa.array(pairs["b"])})

    edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    edges = grouped_exchange_ds(
        edges_ds.map_batches(canon, batch_format="pyarrow"),
        "__b", num_buckets, dedup_pairs,
        empty_schema=edge_schema).materialize()
    empty = pd.DataFrame({"node": pd.Series(dtype="int64"),
                          "deg": pd.Series(dtype="int64"),
                          "n_tri": pd.Series(dtype="int64")})
    if edges.count() == 0:
        return empty

    def endpoints(b: pa.Table) -> pa.Table:
        u = b.column("u").to_numpy(zero_copy_only=False)
        v = b.column("v").to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array(np.concatenate([u, v])),
            "__one": pa.array(np.ones(2 * len(u), dtype=np.int64))})

    deg = _grouped_int_sum(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        "n", "__one", "node", "deg", num_buckets).materialize()

    def _orient_from(du, dv, u, v) -> pa.Table:
        u_first = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_first, u, v)
        z = np.where(u_first, v, u)
        h = pd.util.hash_array(a)
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "a": pa.array(a), "z": pa.array(z)})

    if deg.count() <= broadcast_nodes:
        dt = deg.to_pandas()
        nodes_sorted = np.sort(dt["node"].to_numpy(np.int64))
        degs_sorted = dt.set_index("node").loc[nodes_sorted, "deg"] \
            .to_numpy(np.int64)
        deg_ref = ray.put((nodes_sorted, degs_sorted))

        def orient(b: pa.Table) -> pa.Table:
            nodes, degs = ray.get(deg_ref)
            u = b.column("u").to_numpy(zero_copy_only=False)
            v = b.column("v").to_numpy(zero_copy_only=False)
            du = degs[np.searchsorted(nodes, u)]
            dv = degs[np.searchsorted(nodes, v)]
            return _orient_from(du, dv, u, v)

        oriented_in = edges
    else:
        with_du = hash_join(edges, deg, key="u", right_key="node",
                            left_values=["u", "v"],
                            right_values=["deg"], how="inner",
                            num_buckets=num_buckets).materialize()
        oriented_in = hash_join(
            with_du, deg.map_batches(
                lambda b: b.rename_columns(["node2", "deg2"]),
                batch_format="pyarrow"),
            key="v", right_key="node2",
            left_values=["u", "v", "deg"],
            right_values=["deg2"], how="inner",
            num_buckets=num_buckets)

        def orient(b: pa.Table) -> pa.Table:
            return _orient_from(
                b.column("deg").to_numpy(zero_copy_only=False),
                b.column("deg2").to_numpy(zero_copy_only=False),
                b.column("u").to_numpy(zero_copy_only=False),
                b.column("v").to_numpy(zero_copy_only=False))

    def wedges_of(t: pa.Table) -> pa.Table:
        # as triangle_count.wedges_of, but the wedge CENTER rides along
        a = t.column("a").to_numpy(zero_copy_only=False)
        z = t.column("z").to_numpy(zero_copy_only=False)
        order = np.lexsort((z, a))
        a, z = a[order], z[order]
        _, start = np.unique(a, return_index=True)
        cnt = np.diff(np.append(start, len(a)))
        cnt_row = np.repeat(cnt, cnt)
        pos = np.arange(len(a)) - np.repeat(start, cnt)
        n_after = cnt_row - 1 - pos
        total = int(n_after.sum())
        if total == 0:
            return pa.table({"x": pa.array([], pa.int64()),
                             "y": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        first = np.repeat(np.arange(len(a)), n_after)
        csum = np.concatenate(([0], np.cumsum(n_after)))
        k = np.arange(total) - np.repeat(csum[:-1], n_after)
        second = first + 1 + k
        return pa.table({"x": pa.array(z[first]),
                         "y": pa.array(z[second]),
                         "c": pa.array(a[first])})

    wedge_schema = pa.schema([("x", pa.int64()), ("y", pa.int64()),
                              ("c", pa.int64())])
    wedges = grouped_exchange_ds(
        oriented_in.map_batches(orient, batch_format="pyarrow"),
        "__b", num_buckets, wedges_of, empty_schema=wedge_schema)

    def tag_wedge(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False)
        y = b.column("y").to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(x) ^ pd.util.hash_array(y)
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "x": pa.array(x), "y": pa.array(y), "c": b["c"]})

    def tag_edge(b: pa.Table) -> pa.Table:
        x = b.column("u").to_numpy(zero_copy_only=False)
        y = b.column("v").to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(x) ^ pd.util.hash_array(y)
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "x": pa.array(x), "y": pa.array(y),
            "c": pa.array(np.full(len(x), -1, dtype=np.int64))})

    both = wedges.map_batches(tag_wedge, batch_format="pyarrow") \
        .union(edges.map_batches(tag_edge, batch_format="pyarrow"))

    def intersect(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        is_edge = c == -1
        epairs = np.sort(_pair_struct(x[is_edge], y[is_edge]))
        wx, wy, wc = x[~is_edge], y[~is_edge], c[~is_edge]
        if not len(wx) or not len(epairs):
            return pa.table({"n": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        wpairs = _pair_struct(wx, wy)
        idx = np.searchsorted(epairs, wpairs)
        idx = np.minimum(idx, len(epairs) - 1)
        hit = epairs[idx] == wpairs
        tri_nodes = np.concatenate([wx[hit], wy[hit], wc[hit]])
        u, cc = np.unique(tri_nodes, return_counts=True)
        return pa.table({"n": pa.array(u),
                         "cnt": pa.array(cc.astype(np.int64))})

    partial = grouped_exchange(both, "__b", num_buckets, intersect)
    dt = deg.to_pandas().sort_values("node").reset_index(drop=True)
    if partial is None or partial.num_rows == 0:
        dt["n_tri"] = np.int64(0)
        return dt.astype("int64")
    tn = (partial.to_pandas().groupby("n", as_index=False)
          ["cnt"].sum().rename(columns={"n": "node",
                                        "cnt": "n_tri"}))
    out = dt.merge(tn, on="node", how="left")
    out["n_tri"] = out["n_tri"].fillna(0)
    return out.astype("int64")


def common_neighbors(edges_ds, min_common: int = 2,
                     max_degree: int = 256,
                     num_buckets: int = 32) -> pd.DataFrame:
    """Link prediction by common-neighbor counting (Liben-Nowell &
    Kleinberg, CIKM'03): every NON-adjacent node pair (u < v) sharing
    ``>= min_common`` neighbors, with the count — the classic
    candidate generator for edge recommendation and entity linkage.
    Input: undirected (x, y) edges; parallel duplicates are deduped
    internally.  Returns (u, v, n_common) sorted.

    Centers with degree > ``max_degree`` contribute NO wedges
    (documented contract, mirrored by the oracle): a hub of degree d
    emits C(d, 2) candidate pairs, so one celebrity node would
    dominate the run while its wedges carry almost no signal —
    the standard hub-suppression rule in similarity search over
    graphs.

    Scale shape: TWO exchanges.  (1) center-keyed: both edge
    directions route each edge to its endpoints; merges dedup
    neighbors, skip hubs, enumerate wedge pairs VECTORIZED (the
    repeat/arange pattern — no per-center loop) and pre-count
    locally, so only (pair, partial_count) rows leave.  (2)
    pair-keyed: wedge partials (tag 0) and the deduped edge set
    (tag 1) meet in one exchange; merges sum counts, drop pairs with
    a tag-1 witness (adjacent) and sub-threshold pairs — the driver
    receives survivors only.
    """
    from ..stages.exchange import grouped_exchange, grouped_exchange_ds

    part_schema = pa.schema([
        ("__b", pa.int64()), ("u", pa.int64()), ("v", pa.int64()),
        ("n", pa.int64()), ("tag", pa.int64())])

    def to_center(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False)
        y = b.column("y").to_numpy(zero_copy_only=False)
        c = np.concatenate([x, y])
        nb = np.concatenate([y, x])
        # map-side dedup of repeated (center, neighbor) pairs
        cn = np.unique(_pair_struct(c, nb))
        c, nb = cn["a"], cn["b"]
        return pa.table({"__b": pa.array((c % num_buckets)
                                         .astype(np.int64)),
                         "c": pa.array(c), "nb": pa.array(nb)})

    def wedges(t: pa.Table) -> pa.Table:
        cn = np.unique(_pair_struct(
            t.column("c").to_numpy(zero_copy_only=False),
            t.column("nb").to_numpy(zero_copy_only=False)))
        c, nb = cn["a"], cn["b"]  # sorted by (c, nb)
        _, start = np.unique(c, return_index=True)
        deg = np.diff(np.append(start, len(c)))
        # hub suppression + singletons
        ok = (deg >= 2) & (deg <= max_degree)
        keep = np.repeat(ok, deg)
        c, nb = c[keep], nb[keep]
        if len(c) == 0:
            e = np.empty(0, np.int64)
            return pa.table({"__b": pa.array(e), "u": pa.array(e),
                             "v": pa.array(e), "n": pa.array(e),
                             "tag": pa.array(e)})
        _, start = np.unique(c, return_index=True)
        cnt = np.diff(np.append(start, len(c)))
        cnt_row = np.repeat(cnt, cnt)
        pos = np.arange(len(c)) - np.repeat(start, cnt)
        n_after = cnt_row - 1 - pos
        total = int(n_after.sum())
        first = np.repeat(np.arange(len(c)), n_after)
        csum = np.concatenate(([0], np.cumsum(n_after)))
        k = np.arange(total) - np.repeat(csum[:-1], n_after)
        u, v = nb[first], nb[first + 1 + k]  # u < v (nb sorted per c)
        # local pre-count of identical wedge pairs
        uv, n = np.unique(_pair_struct(u, v), return_counts=True)
        u, v, n = uv["a"], uv["b"], n.astype(np.int64)
        bk = (u * 1_000_003 + v) % num_buckets
        return pa.table({"__b": pa.array(bk), "u": pa.array(u),
                         "v": pa.array(v), "n": pa.array(n),
                         "tag": pa.array(np.zeros(len(u), np.int64))})

    def tag_edges(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False)
        y = b.column("y").to_numpy(zero_copy_only=False)
        xy = np.unique(_pair_struct(np.minimum(x, y),
                                    np.maximum(x, y)))
        u, v = xy["a"], xy["b"]
        bk = (u * 1_000_003 + v) % num_buckets
        return pa.table({"__b": pa.array(bk), "u": pa.array(u),
                         "v": pa.array(v),
                         "n": pa.array(np.zeros(len(u), np.int64)),
                         "tag": pa.array(np.ones(len(u), np.int64))})

    def resolve(t: pa.Table) -> pa.Table:
        tag = t.column("tag").to_numpy(zero_copy_only=False)
        u = t.column("u").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        edges = np.unique(_pair_struct(u[tag == 1], v[tag == 1]))
        wu, wv, wn = u[tag == 0], v[tag == 0], n[tag == 0]
        wp = _pair_struct(wu, wv)
        order = np.argsort(wp)
        wp, wn = wp[order], wn[order]
        new = np.ones(len(wp), dtype=bool)
        new[1:] = wp[1:] != wp[:-1]
        st = np.flatnonzero(new)
        tot = np.add.reduceat(wn, st) if len(st) \
            else np.empty(0, np.int64)
        wp = wp[st]
        adjacent = np.isin(wp, edges)
        sel = (tot >= min_common) & ~adjacent
        return pa.table({"u": pa.array(wp["a"][sel]),
                         "v": pa.array(wp["b"][sel]),
                         "n_common": pa.array(tot[sel])})

    centered = edges_ds.map_batches(to_center, batch_format="pyarrow")
    wedge_ds = grouped_exchange_ds(centered, "__b", num_buckets,
                                   wedges, empty_schema=part_schema)
    edge_tagged = edges_ds.map_batches(tag_edges,
                                       batch_format="pyarrow")
    out = grouped_exchange(wedge_ds.union(edge_tagged), "__b",
                           num_buckets, resolve)
    cols = ("u", "v", "n_common")
    if out is None or out.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    return (out.to_pandas().sort_values(["u", "v"])
            .reset_index(drop=True).astype("int64"))


def degree_log_hist(edges_ds, x_col: str = "x", y_col: str = "y",
                    num_buckets: int = 32) -> pd.DataFrame:
    """DEGREE-DISTRIBUTION tail profile in power-of-two bins — the
    power-law health check for a co-occurrence graph (a heavy tail
    says hub items exist and per-key exchanges need salting; a
    truncated tail says blocking keys are safe): parallel edges dedup
    globally, degree = DISTINCT neighbors per node, and nodes bin by
    ``floor(log2(degree))`` (exact at powers of two in both numpy and
    SQL's libm).  Returns ``(bin, n_nodes, sum_deg, min_deg,
    max_deg)`` sorted by bin.

    Scale shape: ONE pair-hashed exchange dedups edges and emits
    (node) endpoint rows that stay resident; degrees reduce to a
    COUNT HISTOGRAM (`analytics._key_count_histogram`) so the driver
    sees only distinct degree values, never a nodes-sized frame.
    """
    from ..stages.exchange import grouped_exchange_ds
    from .analytics import _key_count_histogram

    node_schema = pa.schema([("node", pa.int64())])

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[x_col]),
                             pc.is_valid(b[y_col])))
        x = pc.cast(b[x_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        y = pc.cast(b[y_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        pairs = np.unique(_pair_struct(x, y))  # map-side dedup
        h = (pd.util.hash_array(pairs["a"])
             ^ pd.util.hash_array(pairs["b"]))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "x": pa.array(pairs["a"]), "y": pa.array(pairs["b"])})

    def fold(t: pa.Table) -> pa.Table:
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        pairs = np.unique(_pair_struct(x, y))  # global edge dedup
        return pa.table({"node": pa.array(np.concatenate(
            [pairs["a"], pairs["b"]]))}).cast(node_schema)

    nodes = grouped_exchange_ds(
        edges_ds.select_columns([x_col, y_col])
        .map_batches(tag, batch_format="pyarrow"),
        "__b", num_buckets, fold, empty_schema=node_schema)
    cv, nk = _key_count_histogram(nodes, "node", num_buckets)
    cols = ("bin", "n_nodes", "sum_deg", "min_deg", "max_deg")
    if not len(cv):
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    bins = np.floor(np.log2(cv)).astype(np.int64)
    df = pd.DataFrame({"bin": bins, "deg": cv, "nk": nk})
    out = (df.assign(sum_deg=df.deg * df.nk)
           .groupby("bin", as_index=False)
           .agg(n_nodes=("nk", "sum"), sum_deg=("sum_deg", "sum"),
                min_deg=("deg", "min"), max_deg=("deg", "max")))
    return (out.sort_values("bin").reset_index(drop=True)
            .astype("int64"))


def type_transition_scc(events_ds, keep_permille_of_max: int = 800,
                        num_buckets: int = 32) -> pd.DataFrame:
    """Strongly-connected components of the event-type transition
    digraph restricted to its HEAVY edges — "which states form
    closed behavioral loops once weak transitions are pruned?" (the
    loop-structure audit over `sessions.transition_counts`' Markov
    surface).  An edge (A → B) survives iff its transition count
    ``n ≥ ceil(keep_permille_of_max/1000 × max_edge_n)``; SCCs are
    mutual-reachability classes over surviving edges (every node is
    in its own class by definition).  Output per event type:
    ``scc_id`` (the lexicographically smallest member) and
    ``scc_size``.

    Distributed shape: the transition counts come from ONE key-hashed
    exchange (`transition_counts`); the pruned digraph is
    ALPHABET-sized, so the closure runs on the driver over a boolean
    matrix (documented enum contract — |types|² bits, never
    event-scaled).  SQL parity: a recursive-CTE reachability closure
    with the same threshold arithmetic.
    """
    from .sessions import transition_counts

    tc = transition_counts(events_ds, num_buckets=num_buckets)
    # node set = every state seen in any transition (a type whose
    # rows never neighbor another event has no Markov surface)
    nodes = sorted(set(tc.prev_state) | set(tc.next_state))
    idx = {t: i for i, t in enumerate(nodes)}
    k = len(nodes)
    if k == 0:
        return pd.DataFrame({"event_type": pd.Series(dtype=object),
                             "scc_id": pd.Series(dtype=object),
                             "scc_size": pd.Series(dtype="int64")})
    max_n = int(tc.n.max())
    tau = -(-keep_permille_of_max * max_n // 1000)  # ceil
    adj = np.zeros((k, k), dtype=bool)
    for r in tc.itertuples():
        if r.n >= tau:
            adj[idx[r.prev_state], idx[r.next_state]] = True
    reach = adj.copy()
    for _ in range(k):  # closure fixpoint in <= |V| squarings
        new = reach | (reach @ reach)
        if (new == reach).all():
            break
        reach = new
    mutual = (reach & reach.T) | np.eye(k, dtype=bool)
    labels = [min(nodes[j] for j in range(k) if mutual[i, j])
              for i in range(k)]
    sizes = pd.Series(labels).map(pd.Series(labels).value_counts())
    return (pd.DataFrame({"event_type": nodes, "scc_id": labels,
                          "scc_size": sizes.astype("int64")})
            .sort_values("event_type").reset_index(drop=True))
