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
