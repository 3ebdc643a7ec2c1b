"""Analytics operators over the testdata tables: grouped column stats,
pricing-summary aggregate, tumbling-window event aggregates, top-k, and
broadcast joins.

Aggregation discipline: every groupby here is preceded by a per-batch
partial aggregation (combine inside ``map_batches``), so the shuffle
moves one row per (key, batch) instead of raw rows — the map-side
combiner pattern.  Means are derived from (sum, count) partials so the
result is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _partial_group_agg(keys: list[str], aggs: dict[str, list[str]]):
    """Per-batch combiner: group within the batch and emit partial
    sum/count/min/max rows."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = []
        for col, ops in aggs.items():
            for op in ops:
                if op == "sum":
                    cols.append((col, "sum"))
                elif op == "count":
                    cols.append((col, "count"))
                elif op == "min":
                    cols.append((col, "min"))
                elif op == "max":
                    cols.append((col, "max"))
                elif op == "mean":  # decomposed: sum + count
                    cols.append((col, "sum"))
                    cols.append((col, "count"))
        cols = list(dict.fromkeys(cols))
        gb = batch.group_by(keys)
        return gb.aggregate(cols)

    return partial


# above this many partial rows (≈ groups × blocks) the driver-side
# final merge reroutes through the hash exchange — an enum-cardinality
# key (lang, source) never comes close; a user_id-cardinality key does
GROUP_PARTIAL_BUDGET = 1_000_000


def _merge_partials(parts_ds, keys: list[str], col_ops: dict[str, str],
                    partial_budget: int = GROUP_PARTIAL_BUDGET,
                    num_buckets: int | None = None,
                    keep_null_keys: bool = False) -> pd.DataFrame:
    """Final merge of per-batch partial-agg rows, cardinality-guarded
    (VERDICT r3 #3): at enum-sized key cardinality the (groups ×
    blocks) partial rows come to the driver and merge in one pandas
    groupby; above ``partial_budget`` partial rows the merge reroutes
    through the hash exchange — each bucket task merges its groups and
    only final result rows (one per group) reach the driver.

    ``parts_ds`` must be materialized-or-rescannable (counted, then
    consumed).  ``col_ops``: partial column → final combine op
    ('sum' | 'min' | 'max').  ``keep_null_keys`` makes a null key its
    own group (SQL GROUP BY) instead of pandas' default drop — the
    exchange route encodes nulls with a validity flag so no string
    sentinel can collide.
    """
    names = parts_ds.schema().names

    def _merge_df(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(keys, as_index=False,
                          dropna=not keep_null_keys).agg(col_ops)

    n_partials = parts_ds.count()
    if n_partials == 0:
        # Ray's to_pandas on all-empty-blocks loses column names —
        # build the empty frame from the schema
        return pd.DataFrame({c: pd.Series(dtype=object) for c in names})
    if n_partials <= partial_budget:
        return _merge_df(parts_ds.to_pandas())

    import ray

    from ..stages.exchange import grouped_exchange

    B = num_buckets or max(
        8, int(ray.cluster_resources().get("CPU", 8)))
    SEP = "\x1f"

    def tag(t: pa.Table) -> pa.Table:
        def enc(c):
            col = pc.cast(t[c], pa.string())
            if not keep_null_keys:
                return col
            flag = pc.if_else(pc.is_null(col), pa.scalar("1"),
                              pa.scalar("0"))
            return pc.binary_join_element_wise(
                flag, pc.fill_null(col, ""), "\x1e")

        k = enc(keys[0])
        for c in keys[1:]:
            k = pc.binary_join_element_wise(k, enc(c), SEP)
        hv = pd.util.hash_array(
            k.to_numpy(zero_copy_only=False).astype(object))
        return t.append_column(
            "__b", pa.array((hv % np.uint64(B)).astype(np.int64)))

    def merge_fn(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_merge_df(t.to_pandas()),
                                    preserve_index=False)

    res = grouped_exchange(
        parts_ds.map_batches(tag, batch_format="pyarrow"),
        "__b", B, merge_fn)
    if res is None:
        return pd.DataFrame({c: pd.Series(dtype=object) for c in names})
    return res.to_pandas()


def grouped_stats(ds, keys: list[str], aggs: dict[str, list[str]],
                  batch_size: int = 65536,
                  partial_budget: int = GROUP_PARTIAL_BUDGET
                  ) -> pd.DataFrame:
    """Exact grouped stats via partial-aggregate + final merge.

    Returns columns named ``{col}_{op}`` (mean derived exactly from
    sum/count at the end).  The final merge is cardinality-guarded
    (see ``_merge_partials``): high-cardinality keys merge in the hash
    exchange, so only one row per group ever reaches the driver.
    """
    partial = _partial_group_agg(keys, aggs)
    parts_ds = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size).materialize()
    col_ops = {
        c: ("sum" if c.endswith(("_sum", "_count")) else
            "min" if c.endswith("_min") else "max")
        for c in parts_ds.schema().names if c not in keys
    }
    out = _merge_partials(parts_ds, keys, col_ops, partial_budget)
    for col, ops in aggs.items():
        if "mean" in ops:
            out[f"{col}_mean"] = out[f"{col}_sum"] / out[f"{col}_count"]
            if "sum" not in ops:
                out = out.drop(columns=[f"{col}_sum"])
            if "count" not in ops:
                out = out.drop(columns=[f"{col}_count"])
    return out.sort_values(keys).reset_index(drop=True)


def approx_count_distinct(ds, group_col: str, value_col: str,
                          p: int = 12,
                          partial_budget: int = GROUP_PARTIAL_BUDGET
                          ) -> pd.DataFrame:
    """Per-group APPROXIMATE distinct counts via a HyperLogLog sketch
    whose state is EXACTLY SQL-restatable — the scale answer when
    ``grouped_count_distinct``'s exact pair shuffle is too much (a
    register file is 2^p bytes per group, independent of cardinality).

    Hash contract (oracle parity by construction): ``h =
    md5_number_upper(CAST(value AS VARCHAR))`` (the engine's
    ``md5_u64le``), register ``idx = h >> (64-p)`` (top p bits),
    ``w = h & (2^(64-p)-1)``, ``rank = (64-p) - floor(log2(w))`` with
    ``w = 0 → (64-p)+1``.  The rank uses exact float64 exponent
    extraction (``np.frexp``; w < 2^53 is exactly representable), the
    SQL side a log2-with-±1-correction — both compute the TRUE bit
    length, so register state matches bit-for-bit.

    Returns one row per group: ``n_nonzero`` registers, ``reg_sum``,
    ``reg_checksum`` (= Σ rank·(idx+1), pins the whole register file)
    — all integers for the oracle — plus ``est`` (int64 floor of the
    standard HLL estimator with linear-counting small-range
    correction; ~1.04/√2^p relative error, pytest-checked, excluded
    from SQL comparison because its float math is not portable).

    Scale shape: each batch pre-maxes to (group, idx, rank) rows
    (≤ groups × 2^p per batch — sketch-sized, not data-sized); the
    register merge (elementwise max) rides the cardinality-guarded
    ``_merge_partials``; the final per-group summary is
    register-file-sized.  Sketches are mergeable across epochs the
    same way (register-wise max) — the W3 drift-sketch contract.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le

    m = 1 << p
    top_shift = np.uint64(64 - p)
    w_mask = np.uint64((1 << (64 - p)) - 1)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[value_col])))
        g = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False)
        h = md5_u64le(pc.cast(b[value_col], pa.string()))
        idx = (h >> top_shift).astype(np.int64)
        w = (h & w_mask).astype(np.float64)  # < 2^52: exactly exact
        exp = np.frexp(w)[1].astype(np.int64)  # bit_length; 0 -> 0
        rank = (64 - p) + 1 - exp
        gu, gc = np.unique(g.astype(object), return_inverse=True)
        # per-batch register max: lexsort (group, idx), reduceat max
        order = np.lexsort((idx, gc))
        gs, is_, rs = gc[order], idx[order], rank[order]
        new = np.ones(len(gs), dtype=bool)
        new[1:] = (gs[1:] != gs[:-1]) | (is_[1:] != is_[:-1])
        starts = np.flatnonzero(new)
        rmax = np.maximum.reduceat(rs, starts) if len(starts) else \
            np.empty(0, np.int64)
        return pa.table({
            "g": pa.array(gu[gs[starts]], type=pa.string()),
            "idx": pa.array(is_[starts]),
            "rank": pa.array(rmax),
        })

    parts_ds = ds.map_batches(partial,
                              batch_format="pyarrow").materialize()
    regs = _merge_partials(parts_ds, ["g", "idx"], {"rank": "max"},
                           partial_budget)
    if not len(regs):
        return pd.DataFrame({
            "g": pd.Series(dtype=object),
            **{c: pd.Series(dtype="int64")
               for c in ("n_nonzero", "reg_sum", "reg_checksum", "est")}})
    out = []
    alpha = 0.7213 / (1 + 1.079 / m)
    for gname, grp in regs.groupby("g", sort=True):
        r = grp["rank"].to_numpy(dtype=np.int64)
        ix = grp["idx"].to_numpy(dtype=np.int64)
        inv_sum = float(np.power(2.0, -r.astype(np.float64)).sum()) \
            + (m - len(r))  # zero registers contribute 2^0 each
        raw = alpha * m * m / inv_sum
        zeros = m - len(r)
        est = m * np.log(m / zeros) if (raw <= 2.5 * m and zeros) else raw
        out.append((gname, len(r), int(r.sum()),
                    int((r * (ix + 1)).sum()), int(np.floor(est))))
    return pd.DataFrame(out, columns=["g", "n_nonzero", "reg_sum",
                                      "reg_checksum", "est"])


def pricing_summary(ds) -> pd.DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem (exercises the
    full partial-agg path with computed columns)."""

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(batch["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        charge = pc.multiply(disc_price,
                             pc.add(pa.scalar(1.0), batch["l_tax"]))
        t = batch.select(["l_returnflag", "l_linestatus", "l_quantity",
                          "l_extendedprice", "l_discount"])
        t = t.append_column("disc_price", disc_price)
        t = t.append_column("charge", charge)
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("charge", "sum"),
             ("l_discount", "sum"), ("l_quantity", "count")])

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = partials.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()
    out = pd.DataFrame({
        "l_returnflag": g.l_returnflag,
        "l_linestatus": g.l_linestatus,
        "sum_qty": g.l_quantity_sum,
        "sum_base_price": np.round(g.l_extendedprice_sum, 2),
        "sum_disc_price": np.round(g.disc_price_sum, 2),
        "sum_charge": np.round(g.charge_sum, 2),
        "avg_qty": np.round(g.l_quantity_sum / g.l_quantity_count, 6),
        "avg_price": np.round(g.l_extendedprice_sum / g.l_quantity_count, 6),
        "avg_disc": np.round(g.l_discount_sum / g.l_quantity_count, 6),
        "count_order": g.l_quantity_count,
    })
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def windowed_events(ds, window: str = "day",
                    partial_budget: int = GROUP_PARTIAL_BUDGET
                    ) -> pd.DataFrame:
    """Tumbling-window aggregate per event_type: Ray Data has no
    event-time windows, so the window key is computed per batch
    (vectorized timestamp floor) and the aggregate is an ordinary
    partial-agg + groupby over (event_type, window_start).  Final
    merge is cardinality-guarded (``_merge_partials``)."""
    unit = {"hour": "hour", "day": "day"}[window]

    def partial(batch: pa.Table) -> pa.Table:
        ws = pc.floor_temporal(batch["ts"], unit=unit)
        t = pa.table({
            "event_type": batch["event_type"],
            "window_start": ws,
            "value": batch["value"],
        })
        return t.group_by(["event_type", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")])

    keys = ["event_type", "window_start"]
    parts_ds = ds.map_batches(partial,
                              batch_format="pyarrow").materialize()
    g = _merge_partials(parts_ds, keys,
                        {"value_sum": "sum", "value_count": "sum"},
                        partial_budget)
    out = pd.DataFrame({
        "event_type": g.event_type,
        "window_start": g.window_start,
        "n_events": g.value_count.astype("int64"),
        "sum_value": np.round(g.value_sum, 6),
    })
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def top_customers(orders_ds, k: int = 10) -> pd.DataFrame:
    """Top-k customers by total order value: partial-agg per batch,
    merge, exact top-k on the (small) per-key totals."""

    def partial(batch: pa.Table) -> pa.Table:
        return batch.select(["o_custkey", "o_totalprice"]).group_by(
            ["o_custkey"]).aggregate([("o_totalprice", "sum"),
                                      ("o_totalprice", "count")])

    partials = orders_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = partials.groupby("o_custkey", as_index=False).sum()
    g["total_value"] = np.round(g.o_totalprice_sum, 2)
    g["n_orders"] = g.o_totalprice_count.astype("int64")
    g = g.sort_values(["total_value", "o_custkey"],
                      ascending=[False, True]).head(k)
    return g[["o_custkey", "n_orders", "total_value"]].reset_index(drop=True)


def revenue_by_segment(orders_ds, customer_table: pa.Table) -> pd.DataFrame:
    """Broadcast join: customer (small side) is shipped once via
    ray.put; each orders batch maps custkey -> mktsegment with a numpy
    searchsorted lookup, partial-aggregates, and only (segment, sums)
    rows move."""
    import ray

    cust = customer_table.select(["c_custkey", "c_mktsegment"])
    keys = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    order = np.argsort(keys)
    segs = np.asarray(cust.column("c_mktsegment").to_pylist(), dtype=object)[order]
    keys = keys[order]
    ref = ray.put((keys, segs))

    def partial(batch: pa.Table) -> pa.Table:
        k, s = ray.get(ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(k, ck)
        pos = np.clip(pos, 0, len(k) - 1)
        seg = np.where(k[pos] == ck, s[pos], None)
        t = pa.table({
            "c_mktsegment": pa.array(seg, type=pa.string()),
            "o_totalprice": batch["o_totalprice"],
        })
        return t.group_by(["c_mktsegment"]).aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")])

    partials = orders_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = partials.groupby("c_mktsegment", as_index=False, dropna=False).sum()
    out = pd.DataFrame({
        "c_mktsegment": g.c_mktsegment,
        "n_orders": g.o_totalprice_count.astype("int64"),
        "revenue": np.round(g.o_totalprice_sum, 2),
    })
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def revenue_by_region(orders_ds, customer: pa.Table, nation: pa.Table,
                      region: pa.Table) -> pd.DataFrame:
    """Q5-shaped multi-hop join: orders → customer → nation → region,
    aggregated to revenue per region.

    All dimension hops are composed DRIVER-SIDE into one small
    custkey→region_name lookup (customer ⋈ nation ⋈ region are tiny),
    broadcast once; the fact table then does a single vectorized
    searchsorted per batch and ships only (region, partial sums).  A
    chain of per-batch joins would re-walk three lookups per row;
    pre-composing the dimensions is the broadcast-join analogue of
    join reordering.
    """
    import ray

    cust = customer.select(["c_custkey", "c_nationkey"]).to_pandas()
    nat = nation.select(["n_nationkey", "n_regionkey"]).to_pandas()
    reg = region.select(["r_regionkey", "r_name"]).to_pandas()
    dim = (cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
               .merge(reg, left_on="n_regionkey", right_on="r_regionkey"))
    keys = dim["c_custkey"].to_numpy()
    order = np.argsort(keys)
    keys = keys[order]
    names = dim["r_name"].to_numpy(dtype=object)[order]
    ref = ray.put((keys, names))

    def partial(batch: pa.Table) -> pa.Table:
        k, nm = ray.get(ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(k, ck), 0, len(k) - 1)
        rname = np.where(k[pos] == ck, nm[pos], None)
        t = pa.table({"r_name": pa.array(rname, type=pa.string()),
                      "o_totalprice": batch["o_totalprice"]})
        return t.group_by(["r_name"]).aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")])

    partials = orders_ds.select_columns(["o_custkey", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    g = partials.groupby("r_name", as_index=False, dropna=False).sum()
    out = pd.DataFrame({
        "r_name": g.r_name,
        "n_orders": g.o_totalprice_count.astype("int64"),
        "revenue": np.round(g.o_totalprice_sum, 2),
    })
    return out.sort_values("r_name").reset_index(drop=True)


def top_lineitems(ds, n: int = 20) -> pd.DataFrame:
    """Top-N rows by price via ``Dataset.sort`` + ``limit`` (the
    distributed range-partitioned sort; deterministic multi-key
    tiebreak so results are scheduling-independent)."""
    out = (ds.select_columns(["l_orderkey", "l_linenumber", "l_extendedprice"])
           .sort(["l_extendedprice", "l_orderkey", "l_linenumber"],
                 descending=[True, False, False])
           .limit(n)
           .to_pandas())
    out["l_extendedprice"] = np.round(out["l_extendedprice"], 2)
    return out


def anti_join_keys(ds, column: str, present_keys) -> pd.DataFrame:
    """Distinct values of ``column`` absent from ``present_keys``
    (broadcast anti-join / referential-orphans check)."""
    import ray

    keys = np.asarray(sorted(present_keys))
    ref = ray.put(keys)

    def partial(batch: pa.Table) -> pa.Table:
        k = ray.get(ref)
        v = batch[column].to_numpy(zero_copy_only=False)
        missing = v[~np.isin(v, k)]
        return pa.table({column: pa.array(np.unique(missing))})

    out = ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    return (out.drop_duplicates().sort_values(column).reset_index(drop=True))


def token_topk_by_source(ds, k: int = 10, source_col: str = "source",
                         token_col: str = "tokens") -> pd.DataFrame:
    """EXACT per-source token top-k: (source, rank, token, cnt, tot).

    Map-side combining: each batch flattens its token lists and runs ONE
    C++ hash aggregate into (source, token, cnt) partials; the driver
    merge is bounded by n_sources × vocab rows — independent of dataset
    row count (vocab caps the distinct-key space), so this scales to
    arbitrary input sizes without a wide shuffle.  Counts and per-source
    totals are integers (freq = cnt/tot derivable downstream).

    Tie policy: rank by (cnt DESC, token ASC) — matches the SQL oracle's
    ROW_NUMBER ordering.
    """
    import pyarrow.compute as pc

    from ..kernels import as_array

    def partial(t: pa.Table) -> pa.Table:
        toks = as_array(t.column(token_col))
        src = as_array(t.column(source_col))
        parents = pc.list_parent_indices(toks)
        st = pa.table({"source": src.take(parents),
                       "token": pc.list_flatten(toks)})
        g = st.group_by(["source", "token"]).aggregate([("token", "count")])
        return g.rename_columns(["source", "token", "cnt"])

    parts = ds.select_columns([source_col, token_col]).map_batches(
        partial, batch_format="pyarrow")
    merged = pa.concat_tables(
        list(parts.iter_batches(batch_format="pyarrow")))
    if merged.num_rows == 0:
        return pd.DataFrame({"source": [], "rank": [], "token": [],
                             "cnt": [], "tot": []})
    g = merged.group_by(["source", "token"]).aggregate([("cnt", "sum")])
    df = g.to_pandas().rename(columns={"cnt_sum": "cnt"})
    df["tot"] = df.groupby("source")["cnt"].transform("sum")
    df = df.sort_values(["source", "cnt", "token"],
                        ascending=[True, False, True], kind="stable")
    df["rank"] = df.groupby("source").cumcount()
    df = df[df["rank"] < k]
    out = df[["source", "rank", "token", "cnt", "tot"]].reset_index(drop=True)
    out["token"] = out["token"].astype("int64")
    out["cnt"] = out["cnt"].astype("int64")
    out["tot"] = out["tot"].astype("int64")
    out["rank"] = out["rank"].astype("int64")
    return out


def grouped_exact_quantiles(ds, group_col: str, value_col: str,
                            qs: tuple = (0.25, 0.5, 0.75),
                            batch_size: int = 65536) -> pd.DataFrame:
    """EXACT per-group discrete quantiles via value counting — the
    scalable exact-quantile pattern for integer / discretized columns:
    each batch collapses to ``(group, value, cnt)`` partials, so the
    data that leaves the map stage is bounded by
    ``groups × distinct_values`` regardless of row count (for
    continuous columns with unbounded cardinality use
    ``state.sketches.TDigest`` instead — approximate but O(δ)).

    Quantile definition matches DuckDB ``quantile_disc``: the value at
    0-based sorted index ``max(0, ceil(q·n) − 1)`` (nulls excluded
    from values; a null GROUP is its own group, SQL GROUP BY
    semantics).  Output: ``group_col, n, q25, q50, ...`` columns.
    """
    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, value_col])
        t = t.filter(pc.is_valid(t.column(value_col)))
        g = t.group_by([group_col, value_col]).aggregate([(value_col, "count")])
        return g.rename_columns([group_col, value_col, "cnt"])

    parts = (ds.select_columns([group_col, value_col])
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=batch_size).materialize())
    qcols = [f"q{int(round(q * 100))}" for q in qs]
    # cardinality-guarded final merge (same routing as grouped_stats):
    # groups × distinct-values × blocks partials merge on the driver at
    # enum scale, in the hash exchange above GROUP_PARTIAL_BUDGET; a
    # null GROUP stays its own group (this operator's documented SQL
    # GROUP BY contract)
    g = _merge_partials(parts, [group_col, value_col], {"cnt": "sum"},
                        keep_null_keys=True)
    if not len(g):
        return pd.DataFrame({group_col: [], "n": [],
                             **{c: [] for c in qcols}})
    g = g.sort_values([group_col, value_col], kind="stable",
                      na_position="first").reset_index(drop=True)
    out_rows = []
    for grp, sub in g.groupby(group_col, dropna=False, sort=False):
        vals = sub[value_col].to_numpy()
        cnts = sub["cnt"].to_numpy()
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        row = {group_col: grp, "n": n}
        for q, qc in zip(qs, qcols):
            pos = max(0, int(np.ceil(q * n)) - 1)  # quantile_disc index
            row[qc] = vals[np.searchsorted(cum, pos + 1)]
        out_rows.append(row)
    out = pd.DataFrame(out_rows)
    return (out.sort_values(group_col, na_position="first")
            .reset_index(drop=True))


def winsorize(ds, group_col: str, value_col: str, id_col: str,
              q_lo: float = 0.05, q_hi: float = 0.95):
    """Per-group winsorization — clamp values to the group's exact
    discrete [q_lo, q_hi] quantiles (outlier capping before feature
    scaling / mixture weighting).  Clamping only compares and copies,
    so the result is exact for any comparable dtype; the fences are
    ``quantile_disc`` members of the data (``grouped_exact_quantiles``
    contract), never interpolated floats.

    Two passes: a value-count quantile pass fixes per-group fences
    (group-cardinality-sized, broadcast as two sorted arrays), then a
    streaming clamp pass emits (id, group, value_w).  ``ds`` is
    consumed twice — pass a materialized-or-rescannable dataset.
    Rows with a null group or value are NOT winsorized and are
    omitted (filter or fill upstream); null groups likewise.
    """
    q = grouped_exact_quantiles(ds, group_col, value_col, qs=(q_lo, q_hi))
    q = q[q[group_col].notna()]
    qc_lo = f"q{int(round(q_lo * 100))}"
    qc_hi = f"q{int(round(q_hi * 100))}"
    out_name = f"{value_col}_w"

    G = np.asarray(q[group_col].astype(str), dtype=object)
    order = np.argsort(G)
    G = G[order]
    LO = q[qc_lo].to_numpy()[order]
    HI = q[qc_hi].to_numpy()[order]

    def clamp(b: pa.Table) -> pa.Table:
        if group_col not in b.column_names:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             group_col: pa.array([], type=pa.string()),
                             out_name: pa.array([], type=pa.int64())})
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[value_col])))
        g = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        v = b[value_col].to_numpy(zero_copy_only=False)
        if len(G):
            idx = np.minimum(np.searchsorted(G, g), len(G) - 1)
            known = G[idx] == g
        else:
            idx = np.zeros(len(g), dtype=np.int64)
            known = np.zeros(len(g), dtype=bool)
        sel = pa.array(np.flatnonzero(known))
        vk = np.clip(v[known], LO[idx[known]], HI[idx[known]])
        return pa.table({id_col: b[id_col].take(sel),
                         group_col: b[group_col].take(sel),
                         out_name: pa.array(vk)})

    return ds.map_batches(clamp, batch_format="pyarrow")


def hopping_window_events(ds, width_hours: int = 24, slide_hours: int = 6,
                          ts_col: str = "ts", value_col: str = "value"
                          ) -> pd.DataFrame:
    """Overlapping (hopping) windows: every event lands in
    ``width/slide`` windows; per-batch partial aggregation keys on the
    window start, so only (window_start, cnt, sum) partials leave the
    map stage — the merge space is bounded by the time range / slide,
    independent of event volume.

    Window starts are epoch-aligned multiples of ``slide_hours`` (the
    same boundaries DuckDB's ``time_bucket`` produces for hour
    intervals).
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    assert width_hours % slide_hours == 0
    k_windows = width_hours // slide_hours
    slide_us = np.int64(slide_hours) * 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        # Normalize to microseconds first: a bare int64 cast yields ticks
        # in the column's NATIVE unit (ns for pandas-born data), which
        # would silently break the us-based window arithmetic below.
        ts = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        val = np.nan_to_num(pc.cast(t.column(value_col), pa.float64())
                            .to_numpy(zero_copy_only=False))
        base = (ts // slide_us) * slide_us
        ws = np.concatenate([base - k * slide_us for k in range(k_windows)])
        v = np.tile(val, k_windows)
        pt = pa.table({"ws": pa.array(ws), "v": pa.array(v)})
        g = pt.group_by("ws").aggregate([("v", "count"), ("v", "sum")])
        return g.rename_columns(["ws", "cnt", "sv"])

    parts = (ds.select_columns([ts_col, value_col])
             .map_batches(partial, batch_format="pyarrow"))
    merged = pa.concat_tables(list(parts.iter_batches(batch_format="pyarrow")))
    if merged.num_rows == 0:
        return pd.DataFrame({"ws": [], "n_events": [], "sum_value": []})
    g = merged.group_by("ws").aggregate([("cnt", "sum"), ("sv", "sum")])
    df = g.to_pandas().rename(columns={"cnt_sum": "n_events",
                                       "sv_sum": "sum_value"})
    df["ws"] = pd.to_datetime(df["ws"], unit="us")
    df["n_events"] = df["n_events"].astype("int64")
    df["sum_value"] = np.round(df["sum_value"], 6)
    return (df[["ws", "n_events", "sum_value"]]
            .sort_values("ws").reset_index(drop=True))


def grouped_histogram(ds, group_col: str, value_col: str, lo: int,
                      hi: int, n_bins: int,
                      batch_size: int = 65536) -> pd.DataFrame:
    """EXACT per-group integer histogram: ``(group, bucket, cnt)``.

    Bucketing contract (all-integer, SQL-reproducible):
    ``bucket = min(max(v - lo, 0) * n_bins // (hi - lo), n_bins - 1)``
    — values below ``lo`` clamp into bucket 0, values at/above ``hi``
    into the last bucket, so every non-null value lands somewhere.
    Combiner pattern: per-batch counts (one row per (group, bucket)
    per batch) are the only thing shuffled; the final merge is
    output-sized (groups × n_bins).  Null groups and null values are
    dropped (SQL GROUP BY/WHERE parity).
    """
    span = hi - lo

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[group_col]),
                             pc.is_valid(t[value_col])))
        if t.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "bucket": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        v = pc.cast(t[value_col], pa.int64()).to_numpy(zero_copy_only=False)
        b = np.minimum(np.maximum(v - lo, 0) * n_bins // span, n_bins - 1)
        pt = pa.table({"g": pc.cast(t[group_col], pa.string()),
                       "bucket": pa.array(b.astype(np.int64))})
        g = pt.group_by(["g", "bucket"]).aggregate([("bucket", "count")])
        return g.rename_columns(["g", "bucket", "cnt"])

    parts = (ds.select_columns([group_col, value_col])
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=batch_size).to_pandas())
    if parts.empty:
        return pd.DataFrame({"group": pd.Series([], dtype=object),
                             "bucket": pd.Series([], dtype="int64"),
                             "cnt": pd.Series([], dtype="int64")})
    out = (parts.groupby(["g", "bucket"], as_index=False)["cnt"].sum()
           .rename(columns={"g": "group"}))
    return out.astype({"bucket": "int64", "cnt": "int64"})


def histogram_drift(cur_ds, ref_ds, group_col: str, value_col: str,
                    lo: int, hi: int, n_bins: int) -> pd.DataFrame:
    """Two-epoch drift report with EXACT counts — the deterministic
    member of the W3 drift family (the sketch path in stages/drift.py
    trades exactness for bounded state; this one is for when both
    epochs are cheap to scan or already projected).

    Returns one row per (group, bucket) present in EITHER epoch:
    ``(group, bucket, n_cur, n_ref, diff)`` with ``diff =
    |n_cur - n_ref|``; callers threshold on ``diff`` / total to flag.
    Bucket grid must be shared, so the contract fixes (lo, hi, n_bins)
    up front rather than deriving them from either epoch's data.
    """
    cur = grouped_histogram(cur_ds, group_col, value_col, lo, hi, n_bins)
    ref = grouped_histogram(ref_ds, group_col, value_col, lo, hi, n_bins)
    m = cur.merge(ref, on=["group", "bucket"], how="outer",
                  suffixes=("_cur", "_ref")).fillna(0)
    m = m.rename(columns={"cnt_cur": "n_cur", "cnt_ref": "n_ref"})
    m["diff"] = (m.n_cur - m.n_ref).abs()
    m = m.astype({"bucket": "int64", "n_cur": "int64", "n_ref": "int64",
                  "diff": "int64"})
    return (m[["group", "bucket", "n_cur", "n_ref", "diff"]]
            .sort_values(["group", "bucket"]).reset_index(drop=True))


def pivot_counts(ds, row_col: str, cat_col: str,
                 categories: list[str], prefix: str = "n_"
                 ) -> pd.DataFrame:
    """Wide contingency matrix — one row per ``row_col`` value, one
    int64 count column per entry of ``categories`` (SQL conditional
    aggregation ``SUM(CASE WHEN cat = c THEN 1 ELSE 0 END)``): the
    activity-matrix / confusion-matrix shape (event type × weekday,
    lang × split, label × predicted-label).

    Scale shape: each batch reduces to a (distinct rows × categories)
    integer partial via one factorize + ``np.add.at`` — zero shuffles;
    the driver merges partials bounded by distinct ``row_col`` values
    × len(categories), independent of row count.  The category list
    is FIXED by the caller (the oracle needs literal columns anyway);
    values outside it and null rows/categories are ignored.
    """
    import pyarrow.compute as pc

    cat_arr = pa.array(categories, type=pa.string())
    ncat = len(categories)

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[row_col]),
                             pc.is_valid(b[cat_col])))
        cidx = pc.index_in(pc.cast(b[cat_col], pa.string()),
                           value_set=cat_arr)
        keep = pc.is_valid(cidx)
        b = b.filter(keep)
        ci = cidx.filter(keep).to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(
            pd.Series(pc.cast(b[row_col], pa.string())
                      .to_numpy(zero_copy_only=False)))
        mat = np.zeros((len(uniq), ncat), dtype=np.int64)
        np.add.at(mat, (codes, ci.astype(np.int64)), 1)
        cols = {row_col: pa.array(uniq, type=pa.string())}
        for j, c in enumerate(categories):
            cols[f"{prefix}{c}"] = pa.array(mat[:, j])
        return pa.table(cols)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cnames = [f"{prefix}{c}" for c in categories]
    if not len(parts):
        # explicit dtypes so the empty edge matches the non-empty
        # path (object row_col, int64 counts) for dtype-sensitive
        # consumers / oracle comparison
        return pd.DataFrame(
            {row_col: pd.Series(dtype=object),
             **{c: pd.Series(dtype="int64") for c in cnames}})
    out = (parts.groupby(row_col, as_index=False)[cnames].sum()
           .sort_values(row_col).reset_index(drop=True))
    return out.astype({c: "int64" for c in cnames})


def rollup_counts(ds, cols: list[str]) -> pd.DataFrame:
    """Hierarchical ROLLUP counts — one row per prefix level of
    ``cols`` (SQL ``GROUP BY ROLLUP (c1, c2, ...)``): the finest
    grouping, every prefix subtotal, and the grand total, with NULL
    marking each rolled-up column.  The one-pass answer to "counts by
    (lang, source), by lang, and overall" without three scans.

    Rows with a NULL in any grouping column are dropped first — SQL's
    ROLLUP output cannot distinguish a data NULL from a rollup marker,
    so the engine refuses the ambiguity (same policy as the grouped
    operators; the oracle filters identically).

    Scale shape: each batch reduces to finest-level (c1..ck, count)
    partials (one factorize over the combined key); the driver merge
    is bounded by finest-group cardinality and derives every coarser
    level from it — subtotals never touch the data again.
    """
    import pyarrow.compute as pc

    SEP = "\x1f"

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.is_valid(b[cols[0]])
        for c in cols[1:]:
            mask = pc.and_(mask, pc.is_valid(b[c]))
        b = b.filter(mask)
        key = pc.cast(b[cols[0]], pa.string())
        for c in cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(b[c], pa.string()), SEP)
        codes, uniq = pd.factorize(
            pd.Series(key.to_numpy(zero_copy_only=False)))
        cnt = np.bincount(codes, minlength=len(uniq))
        return pa.table({"k": pa.array(uniq, type=pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        # SQL ROLLUP over an empty (or fully filtered) input still
        # emits the grand-total row (NULL, ..., 0)
        out = pd.DataFrame({c: [None] for c in cols})
        out["n"] = np.int64(0)
        return out
    fin = parts.groupby("k", as_index=False)["c"].sum()
    split = fin["k"].str.split(SEP, expand=True)
    split.columns = cols
    fin = pd.concat([split, fin["c"].rename("n")], axis=1)

    levels = [fin]
    for depth in range(len(cols) - 1, -1, -1):
        keep = cols[:depth]
        sub = (fin.groupby(keep, as_index=False)["n"].sum() if keep
               else pd.DataFrame({"n": [fin["n"].sum()]}))
        for c in cols[depth:]:
            sub[c] = None
        levels.append(sub[cols + ["n"]])
    out = pd.concat(levels, ignore_index=True)
    return (out.astype({"n": "int64"})
            .sort_values(cols, na_position="last")
            .reset_index(drop=True))


def grouped_count_distinct(ds, group_col: str, value_col: str,
                           num_buckets: int = 64) -> pd.DataFrame:
    """Exact ``COUNT(DISTINCT value)`` per group — the cardinality
    query (distinct users per segment, distinct domains per language)
    whose naive form shuffles every row.

    Scale shape: each input block first collapses to its DISTINCT
    (group, value) pairs (``np.unique`` map-side — repeated values
    never leave the block), the surviving pairs route through one
    hash exchange keyed on the pair (each distinct pair lands in
    exactly ONE bucket), each bucket de-dups once more and emits
    group-cardinality-sized ``(group, n)`` partials, and the driver
    sums partials per group.  Nothing row-count-sized is shuffled or
    materialized; the exchange carries distinct pairs only.

    Nulls: null VALUES are ignored (SQL ``COUNT(DISTINCT)``); a null
    GROUP is its own group (SQL ``GROUP BY``), encoded via a validity
    flag so no string sentinel can collide.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    SEP = "\x1f"

    def partial(b: pa.Table) -> pa.Table:
        from ..kernels import as_array

        b = b.filter(pc.is_valid(b[value_col]))
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "gnull": pa.array([], type=pa.bool_()),
                             "comb": pa.array([], type=pa.string()),
                             "bucket": pa.array([], type=pa.uint64())})
        g = as_array(pc.fill_null(pc.cast(b[group_col], pa.string()), ""))
        gnull = as_array(pc.is_null(b[group_col]))
        v = as_array(pc.cast(b[value_col], pa.string()))
        nflag = pc.if_else(gnull, pa.scalar("1"), pa.scalar("0"))
        comb = as_array(pc.binary_join_element_wise(nflag, g, v, SEP))
        _, idx = np.unique(comb.to_numpy(zero_copy_only=False),
                           return_index=True)
        take = pa.array(np.sort(idx))
        comb_u = comb.take(take)
        return pa.table({
            "g": g.take(take),
            "gnull": gnull.take(take),
            "comb": comb_u,
            "bucket": pa.array(md5_u64le(comb_u), type=pa.uint64())})

    def count_bucket(t: pa.Table) -> pa.Table:
        carr = t.column("comb").to_numpy(zero_copy_only=False)
        _, idx = np.unique(carr, return_index=True)
        g = t.column("g").to_numpy(zero_copy_only=False)[idx]
        gn = t.column("gnull").to_numpy(zero_copy_only=False)[idx]
        key = np.char.add(gn.astype("U1"), g.astype(str))
        gu, counts = np.unique(key, return_counts=True)
        return pa.table({
            "gnull": pa.array([k[0] == "T" for k in gu]),
            "g": pa.array([k[1:] for k in gu], type=pa.string()),
            "n": pa.array(counts.astype(np.int64))})

    pairs = ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(pairs, "bucket", num_buckets, count_bucket)
    if res is None:
        return pd.DataFrame({group_col: pd.Series(dtype="string"),
                             "n": pd.Series(dtype="int64")})
    df = res.to_pandas().groupby(["gnull", "g"], as_index=False)["n"].sum()
    out = pd.DataFrame({
        group_col: df.apply(lambda r: None if r.gnull else r.g, axis=1),
        "n": df.n.astype(np.int64)})
    return (out.sort_values(group_col, na_position="last")
            .reset_index(drop=True))


def kmv_distinct(ds, group_col: str, value_col: str, k: int = 64,
                 num_buckets: int = 32) -> pd.DataFrame:
    """Per-group K-Minimum-Values distinct-count sketch — the
    mergeable alternative to ``approx_count_distinct``'s HLL whose
    whole state is trivially SQL-restatable: the register is literally
    the ``k`` smallest DISTINCT ``md5_number_upper(value)`` hashes
    (DuckDB: ``ROW_NUMBER() OVER (ORDER BY hash) <= k``).

    Returns one row per group: ``n_reg`` (register fill — the exact
    distinct count while < k), ``kth_hash`` (the largest register
    member as a decimal string; u64 doesn't fit BIGINT), and
    ``reg_checksum`` (Σ h mod 1e9+7 over the register — pins the whole
    register), all oracle-comparable; plus ``est``, the standard KMV
    estimator ``(k-1) * 2^64 / kth`` as int64 (exact count when the
    register isn't full), float math excluded from SQL comparison —
    drop it in oracle-checked queries, accuracy is pytest-checked.

    Scale shape: each batch reduces to its k smallest distinct
    (group, hash) pairs (sketch-sized partials), ONE group-keyed
    exchange merges registers (dedup + k smallest) and emits one row
    per group.  Register merge across epochs is the same union+cap —
    the W3 mergeable-sketch contract.  Null groups/values drop.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    MOD = np.uint64(1_000_000_007)

    def _per_group_k_smallest(g: np.ndarray, h: np.ndarray):
        order = np.lexsort((h, g))
        gs, hs = g[order], h[order]
        keep = np.ones(len(gs), dtype=bool)
        keep[1:] = (gs[1:] != gs[:-1]) | (hs[1:] != hs[:-1])
        gs, hs = gs[keep], hs[keep]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = gs[1:] != gs[:-1]
        start = np.flatnonzero(first)
        cnt = np.diff(np.append(start, len(gs)))
        pos = np.arange(len(gs)) - np.repeat(start, cnt)
        cap = pos < k
        return gs[cap], hs[cap]

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], type=pa.string()),
                          "h": pa.array([], type=pa.uint64()),
                          "bucket": pa.array([], type=pa.uint64())})
        if b.num_rows == 0 or group_col not in b.column_names:
            return empty
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[value_col])))
        if b.num_rows == 0:
            return empty
        g = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        h = md5_u64le(pc.cast(b[value_col], pa.string()))
        gs, hs = _per_group_k_smallest(g, h)
        garr = pa.array(gs, type=pa.string())
        return pa.table({"g": garr,
                         "h": pa.array(hs, type=pa.uint64()),
                         "bucket": pa.array(md5_u64le(garr),
                                            type=pa.uint64())})

    def merge(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False).astype(object)
        h = t.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        gs, hs = _per_group_k_smallest(g, h)
        first = np.ones(len(gs), dtype=bool)
        first[1:] = gs[1:] != gs[:-1]
        start = np.flatnonzero(first)
        n_reg = np.diff(np.append(start, len(gs))).astype(np.int64)
        kth = np.maximum.reduceat(hs, start)  # register max per group
        csum = np.add.reduceat((hs % MOD).astype(np.int64), start)
        full = n_reg >= k
        with np.errstate(divide="ignore"):
            est = np.where(
                full,
                ((k - 1) * np.float64(2.0 ** 64)
                 / np.maximum(kth.astype(np.float64), 1.0)).astype(np.int64),
                n_reg)
        return pa.table({
            "g": pa.array(gs[start], type=pa.string()),
            "n_reg": pa.array(n_reg),
            "kth_hash": pa.array([str(int(x)) for x in kth],
                                 type=pa.string()),
            "reg_checksum": pa.array(csum),
            "est": pa.array(est.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(parts, "bucket", num_buckets, merge)
    cols = {group_col: "string", "n_reg": "int64", "kth_hash": "string",
            "reg_checksum": "int64", "est": "int64"}
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype=d) for c, d in cols.items()})
    df = res.to_pandas().rename(columns={"g": group_col})
    return df.sort_values(group_col).reset_index(drop=True)


def zscore_outliers(ds, group_col: str, value_col: str, id_col: str,
                    k: int = 3,
                    partial_budget: int = GROUP_PARTIAL_BUDGET):
    """Per-group z-score outlier detection, integer-exact end to end
    (the drift-adjacent data-quality scan: rows whose value sits more
    than ``k`` population standard deviations from their group mean).

    No float ever enters the decision.  The condition
    ``|x - mean| > k * stddev``  is rewritten over integer sufficient
    statistics (n = count, S = sum x, S2 = sum x^2):

        (n*x - S)^2 > k^2 * (n*S2 - S^2)
        <=>  n*x > S + T  or  n*x < S - T,   T = isqrt(k^2*(n*S2 - S^2))
        <=>  x >= (S+T)//n + 1  or  x <= (S-T-1)//n

    (a^2 > R <=> a > isqrt(R) for non-negative integers), so each group
    reduces to two int64 BOUNDS computed in exact arbitrary-precision
    Python ints on the driver; the flag pass is two vectorized integer
    compares against the broadcast bounds.  Exact while each group's
    ``sum(x^2)`` fits int64 (|x| <= 3e9 per row; document upstream).

    Scale shape: stats pass emits per-block (group, n, S, S2) partials
    merged through the cardinality-guarded ``_merge_partials``; the
    flag pass streams and returns an output-sized Dataset of
    (id, group, value) outlier rows.  ``ds`` is consumed twice —
    pass a materialized-or-rescannable dataset (read from parquet is
    fine).  Rows with a null group or value are ignored in the stats
    and never flagged.  Population variance (ddof = 0).
    """
    import math

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64()),
                          "s": pa.array([], type=pa.int64()),
                          "s2": pa.array([], type=pa.int64())})
        if b.num_rows == 0 or group_col not in b.column_names:
            return empty
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[value_col])))
        if b.num_rows == 0:
            return empty
        x = pc.cast(b[value_col], pa.int64())  # raises on non-integral
        t = pa.table({"g": pc.cast(b[group_col], pa.string()),
                      "x": x, "xx": pc.multiply_checked(x, x)})
        agg = pa.TableGroupBy(t, ["g"]).aggregate(
            [("x", "sum"), ("xx", "sum"), ([], "count_all")])
        return pa.table({"g": agg["g"],
                         "n": pc.cast(agg["count_all"], pa.int64()),
                         "s": agg["x_sum"], "s2": agg["xx_sum"]})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    stats = _merge_partials(parts, ["g"],
                            {"n": "sum", "s": "sum", "s2": "sum"},
                            partial_budget=partial_budget)
    if len(stats) == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], type=pa.int64()),
            group_col: pa.array([], type=pa.string()),
            value_col: pa.array([], type=pa.int64())}))

    groups, his, los = [], [], []
    for g, n, s, s2 in zip(stats.g, stats.n, stats.s, stats.s2):
        n, s, s2 = int(n), int(s), int(s2)  # exact Python ints
        r = k * k * (n * s2 - s * s)       # >= 0 by Cauchy-Schwarz
        t = math.isqrt(r)
        groups.append(g)
        his.append((s + t) // n + 1)
        los.append((s - t - 1) // n)
    order = np.argsort(np.asarray(groups, dtype=object))
    G = np.asarray(groups, dtype=object)[order]
    HI = np.asarray(his, dtype=np.int64)[order]
    LO = np.asarray(los, dtype=np.int64)[order]

    def flag(b: pa.Table) -> pa.Table:
        if group_col not in b.column_names:
            # pre-map-schema empty block (CLAUDE.md: Ray Data passes
            # empty blocks through without calling upstream fns)
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             group_col: pa.array([], type=pa.string()),
                             value_col: pa.array([], type=pa.int64())})
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[value_col])))
        g = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        x = pc.cast(b[value_col], pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(G, g)
        idx_c = np.minimum(idx, len(G) - 1)
        known = G[idx_c] == g
        out = known & ((x >= HI[idx_c]) | (x <= LO[idx_c]))
        sel = pa.array(np.flatnonzero(out))
        return pa.table({id_col: b[id_col].take(sel),
                         group_col: pc.cast(b[group_col].take(sel),
                                            pa.string()),
                         value_col: pa.array(x[out])})

    return ds.map_batches(flag, batch_format="pyarrow")


def grouped_mode(ds, group_col: str, value_col: str,
                 num_buckets: int = 64) -> pd.DataFrame:
    """Exact per-group MODE (most frequent value; ties break to the
    smallest value) — the categorical summary query (dominant event
    type per user, dominant language per source).

    Scale shape: each input block collapses to per-block (group,
    value, cnt) partials via Arrow ``group_by`` (repeated values never
    leave the block), partials route through ONE hash exchange keyed
    on the group (all of a group's partials meet in exactly one
    bucket), each bucket merges counts and emits ONE row per group —
    so the driver sees group-cardinality rows, never value pairs.

    Nulls: null VALUES are ignored (SQL aggregate semantics); a null
    GROUP is its own group, encoded via a validity flag.  Tie order is
    the VALUE's natural order rendered as string (exact for string
    values; callers with numeric values needing numeric tie order
    should zero-pad upstream).
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange
    from ..kernels import as_array

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"g": pa.array([], type=pa.string()),
                          "gnull": pa.array([], type=pa.bool_()),
                          "v": pa.array([], type=pa.string()),
                          "cnt": pa.array([], type=pa.int64()),
                          "bucket": pa.array([], type=pa.uint64())})
        if b.num_rows == 0 or group_col not in b.column_names:
            return empty
        b = b.filter(pc.is_valid(b[value_col]))
        if b.num_rows == 0:
            return empty
        t = pa.table({
            "g": pc.fill_null(pc.cast(b[group_col], pa.string()), ""),
            "gnull": pc.is_valid(b[group_col]),
            "v": pc.cast(b[value_col], pa.string())})
        agg = pa.TableGroupBy(t, ["gnull", "g", "v"]).aggregate([([], "count_all")])
        g = as_array(agg["g"])
        return pa.table({
            "g": g,
            "gnull": pc.invert(as_array(agg["gnull"])),
            "v": agg["v"],
            "cnt": pc.cast(agg["count_all"], pa.int64()),
            "bucket": pa.array(md5_u64le(g), type=pa.uint64())})

    def mode_bucket(t: pa.Table) -> pa.Table:
        merged = pa.TableGroupBy(t, ["gnull", "g", "v"]).aggregate([("cnt", "sum")])
        g = merged.column("g").to_numpy(zero_copy_only=False).astype(str)
        gn = merged.column("gnull").to_numpy(zero_copy_only=False)
        v = merged.column("v").to_numpy(zero_copy_only=False).astype(str)
        cnt = merged.column("cnt_sum").to_numpy(zero_copy_only=False)
        gkey = np.char.add(np.where(gn, "1", "0"), g)
        order = np.lexsort((v, -cnt, gkey))  # per group: cnt desc, v asc
        gkey_s = gkey[order]
        first = np.concatenate(([True], gkey_s[1:] != gkey_s[:-1]))
        pick = order[first]
        return pa.table({
            "gnull": pa.array(gn[pick]),
            "g": pa.array(g[pick], type=pa.string()),
            "mode_value": pa.array(v[pick], type=pa.string()),
            "mode_count": pa.array(cnt[pick].astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(parts, "bucket", num_buckets, mode_bucket)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({group_col: pd.Series(dtype="string"),
                             "mode_value": pd.Series(dtype="string"),
                             "mode_count": pd.Series(dtype="int64")})
    df = res.to_pandas()
    out = pd.DataFrame({
        group_col: df.apply(lambda r: r.g if not r.gnull else None, axis=1),
        "mode_value": df.mode_value,
        "mode_count": df.mode_count.astype(np.int64)})
    return (out.sort_values(group_col, na_position="last")
            .reset_index(drop=True))


def grouped_having_count(ds, group_cols: list[str], min_count: int = 2,
                         num_buckets: int = 64):
    """Multi-column ``GROUP BY ... HAVING COUNT(*) >= k`` — composite
    duplicate detection ("these (a, b) pairs occur more than once")
    and the HOT-KEY diagnostic for sizing shuffles (which keys would
    flood a join/exchange bucket).  Returns a Dataset of the group
    columns + ``n``.

    Scale shape: each block collapses to its distinct combined keys
    with partial counts (``np.unique`` map-side — a hot key leaves
    each block as ONE row no matter its multiplicity), partials route
    through a key-hashed exchange, buckets sum and filter.  Null group
    values are kept as their own group (SQL GROUP BY), encoded with a
    per-column validity flag so no string sentinel collides.
    """
    from ..functions.hashing import md5_u64le
    from ..kernels import as_array
    from ..stages.exchange import grouped_exchange_ds

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(c, types[c]) for c in group_cols]
                           + [("n", pa.int64())])

    def _ckey(b: pa.Table):
        arr = None
        for g in group_cols:
            col = as_array(b[g])
            flag = pc.if_else(pc.is_null(col), pa.scalar("1"),
                              pa.scalar("0"))
            s = pc.binary_join_element_wise(
                flag, pc.fill_null(pc.cast(col, pa.string()), ""), "\x1e")
            arr = s if arr is None else pc.binary_join_element_wise(
                arr, s, "\x1f")
        return as_array(arr)

    def partial(b: pa.Table) -> pa.Table:
        key = _ckey(b)
        _, idx, cnt = np.unique(key.to_numpy(zero_copy_only=False),
                                return_index=True, return_counts=True)
        take = pa.array(idx)
        key_u = key.take(take)
        cols = {"__key": key_u,
                "__b": pa.array(md5_u64le(key_u), type=pa.uint64()),
                "n": pa.array(cnt.astype(np.int64))}
        for g in group_cols:
            cols[g] = as_array(b[g]).take(take)
        return pa.table(cols)

    def reduce_bucket(t: pa.Table) -> pa.Table:
        karr = t.column("__key").to_numpy(zero_copy_only=False)
        u, idx, inv = np.unique(karr, return_index=True,
                                return_inverse=True)
        tot = np.zeros(len(u), dtype=np.int64)
        np.add.at(tot, inv, t.column("n").to_numpy(zero_copy_only=False))
        keep = tot >= min_count
        if not keep.any():
            return None
        sel = pa.array(idx[keep])
        cols = {g: t.column(g).take(sel) for g in group_cols}
        cols["n"] = pa.array(tot[keep])
        return pa.table(cols).cast(out_schema)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_exchange_ds(parts, "__b", num_buckets, reduce_bucket,
                               empty_schema=out_schema)


def cube_counts(ds, cols: list[str]) -> pd.DataFrame:
    """Full CUBE counts — one row per SUBSET of ``cols`` (SQL ``GROUP
    BY CUBE (c1, ..., ck)``): every combination of kept/rolled-up
    columns, 2^k grouping sets in one pass, with NULL marking each
    rolled-up column.  Complements ``rollup_counts`` (prefix levels
    only) for the "counts by lang, by source, by (lang, source), and
    overall" cross-tab question.

    Rows with a NULL in any grouping column are dropped first — CUBE
    output cannot distinguish a data NULL from a rollup marker (same
    policy and partial pass as ``rollup_counts``).

    Scale shape: identical to ``rollup_counts`` — each batch reduces
    to finest-level (c1..ck, count) partials; every coarser grouping
    set is derived from the finest counts driver-side (bounded by
    finest-group cardinality × 2^k, never by row count).
    """
    SEP = "\x1f"

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.is_valid(b[cols[0]])
        for c in cols[1:]:
            mask = pc.and_(mask, pc.is_valid(b[c]))
        b = b.filter(mask)
        key = pc.cast(b[cols[0]], pa.string())
        for c in cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(b[c], pa.string()), SEP)
        codes, uniq = pd.factorize(
            pd.Series(key.to_numpy(zero_copy_only=False)))
        cnt = np.bincount(codes, minlength=len(uniq))
        return pa.table({"k": pa.array(uniq, type=pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        # SQL CUBE over an empty (or fully filtered) input still emits
        # the grand-total row (NULL, ..., 0)
        out = pd.DataFrame({c: [None] for c in cols})
        out["n"] = np.int64(0)
        return out
    fin = parts.groupby("k", as_index=False)["c"].sum()
    split = fin["k"].str.split(SEP, expand=True)
    split.columns = cols
    fin = pd.concat([split, fin["c"].rename("n")], axis=1)

    levels = []
    for mask in range(1 << len(cols)):
        keep = [c for i, c in enumerate(cols) if mask & (1 << i)]
        sub = (fin.groupby(keep, as_index=False)["n"].sum() if keep
               else pd.DataFrame({"n": [fin["n"].sum()]}))
        for c in cols:
            if c not in keep:
                sub[c] = None
        levels.append(sub[cols + ["n"]])
    out = pd.concat(levels, ignore_index=True)
    return (out.astype({"n": "int64"})
            .sort_values(cols, na_position="last")
            .reset_index(drop=True))


def heavy_hitters(ds, key_cols: list[str], min_count: int,
                  width: int = 16384, depth: int = 4,
                  partial_budget: int = GROUP_PARTIAL_BUDGET
                  ) -> pd.DataFrame:
    """EXACT frequent-key detection at sketch cost — keys occurring at
    least ``min_count`` times, with their exact counts (SQL ``GROUP BY
    key HAVING COUNT(*) >= min_count``), without ever shuffling or
    driver-collecting the full key-cardinality count table.

    Two-phase shape (the standard sketch-then-verify move):

    1. **Sketch pass** — each batch folds its keys into a sparse
       Count-Min update: ``depth`` hash rows of ``width`` counters
       (hash d of key = ``md5_u64le(f"{d}\\x1f{key}") % width``).
       Partials are (d, w, cnt) rows — bounded by depth × width per
       batch, independent of key cardinality — merged by sum through
       the cardinality-guarded ``_merge_partials``; the dense
       depth×width sketch (a few hundred KB) is then broadcast via
       ``ray.put``.
    2. **Verify pass** — each batch queries the sketch for its UNIQUE
       keys; Count-Min only OVERestimates, so ``est >= min_count`` is
       a SUPERSET of the true heavy hitters (no false negatives, ever).
       Only candidate keys emit exact per-batch counts; the candidate
       merge is bounded by (true hitters + collision false positives)
       × blocks, and the final ``>= min_count`` filter on exact counts
       removes every false positive — output is EXACT.

    ``ds`` is consumed twice (sketch + verify) — pass a
    materialized-or-rescannable dataset; ``.materialize()`` an
    expensive lazy upstream first.

    Sizing: false positives appear when distinct-keys / width
    approaches min_count's scale; width=16384 × depth=4 keeps the
    candidate set output-sized up to ~10^7 distinct keys for
    percent-level thresholds.  Null key components drop the row (SQL
    parity: the oracle filters IS NOT NULL identically).
    """
    import ray

    from ..functions.hashing import md5_u64le
    from ..kernels import as_array

    SEP = "\x1f"
    W = np.uint64(width)

    def _keys(b: pa.Table):
        mask = pc.is_valid(b[key_cols[0]])
        for c in key_cols[1:]:
            mask = pc.and_(mask, pc.is_valid(b[c]))
        b = b.filter(mask)
        key = pc.cast(b[key_cols[0]], pa.string())
        for c in key_cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(b[c], pa.string()), SEP)
        return b, as_array(key)

    def _cells(uniq: np.ndarray) -> np.ndarray:
        """(depth, n_uniq) Count-Min column index per unique key."""
        ua = pa.array(uniq, type=pa.string())
        rows = []
        for d in range(depth):
            tagged = pc.binary_join_element_wise(
                pa.scalar(str(d)), ua, SEP)
            rows.append((md5_u64le(tagged) % W).astype(np.int64))
        return np.stack(rows)

    def sketch_partial(b: pa.Table) -> pa.Table:
        _, key = _keys(b)
        if len(key) == 0:
            return pa.table({"d": pa.array([], type=pa.int64()),
                             "w": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        uniq, counts = np.unique(key.to_numpy(zero_copy_only=False),
                                 return_counts=True)
        cells = _cells(uniq)
        ds_, ws_, cs_ = [], [], []
        for d in range(depth):
            # several keys may share a cell within the batch — sum them
            cw, cidx = np.unique(cells[d], return_inverse=True)
            cnt = np.zeros(len(cw), dtype=np.int64)
            np.add.at(cnt, cidx, counts)
            ds_.append(np.full(len(cw), d, dtype=np.int64))
            ws_.append(cw)
            cs_.append(cnt)
        return pa.table({"d": pa.array(np.concatenate(ds_)),
                         "w": pa.array(np.concatenate(ws_)),
                         "cnt": pa.array(np.concatenate(cs_))})

    parts = ds.map_batches(sketch_partial,
                           batch_format="pyarrow").materialize()
    merged = _merge_partials(parts, ["d", "w"], {"cnt": "sum"},
                             partial_budget)
    sketch = np.zeros((depth, width), dtype=np.int64)
    if len(merged):
        sketch[merged["d"].to_numpy(dtype=np.int64),
               merged["w"].to_numpy(dtype=np.int64)] = \
            merged["cnt"].to_numpy(dtype=np.int64)
    sketch_ref = ray.put(sketch)

    def verify_partial(b: pa.Table) -> pa.Table:
        sk = ray.get(sketch_ref)
        _, key = _keys(b)
        if len(key) == 0:
            return pa.table({"k": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        karr = key.to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(karr, return_counts=True)
        cells = _cells(uniq)
        est = sk[0, cells[0]]
        for d in range(1, depth):
            est = np.minimum(est, sk[d, cells[d]])
        cand = est >= min_count
        return pa.table({"k": pa.array(uniq[cand], type=pa.string()),
                         "n": pa.array(counts[cand].astype(np.int64))})

    cparts = ds.map_batches(verify_partial,
                            batch_format="pyarrow").materialize()
    cand = _merge_partials(cparts, ["k"], {"n": "sum"}, partial_budget)
    if not len(cand):
        out = pd.DataFrame({c: pd.Series(dtype=object) for c in key_cols})
        out["n"] = pd.Series(dtype="int64")
        return out
    cand = cand[cand["n"] >= min_count]
    split = cand["k"].str.split(SEP, expand=True)
    if split.shape[1] < len(key_cols):  # all-empty edge
        for i in range(split.shape[1], len(key_cols)):
            split[i] = pd.Series(dtype=object)
    split.columns = key_cols
    out = pd.concat([split.reset_index(drop=True),
                     cand["n"].astype("int64").reset_index(drop=True)],
                    axis=1)
    return out.sort_values(key_cols).reset_index(drop=True)


def iqr_outliers(ds, group_col: str, value_col: str, id_col: str,
                 k_half: int = 3, batch_size: int = 65536):
    """Per-group IQR (Tukey-fence) outlier detection with EXACT integer
    arithmetic — rows whose value falls outside
    ``[q1 - (k_half/2)·IQR, q3 + (k_half/2)·IQR]`` for their group
    (``k_half=3`` = the classic 1.5×IQR fence).  The per-group length /
    score outlier filter a corpus-quality pass runs before training.

    Exactness contract: quantiles are exact discrete order statistics
    (``grouped_exact_quantiles`` — DuckDB ``quantile_disc`` parity) and
    the fence comparison is doubled to stay integral:
    ``2·v > 2·q3 + k_half·(q3 − q1)`` — no float rounding anywhere, so
    the flagged ID SET hash-matches SQL.

    Scale shape: quantile pass reduces to (group, value, cnt) partials
    (value-cardinality bound); the per-group fences — group-cardinality
    sized — broadcast via ``ray.put``; the flag pass streams, each
    batch doing one vectorized dict-code lookup + integer compare.
    ``ds`` is consumed twice (quantile + flag) — pass a
    materialized-or-rescannable dataset.  Null group/value/id rows
    drop (SQL parity).  Output Dataset: ``id_col, group_col,
    value_col, side`` ('low' | 'high').
    """
    import ray

    from ..kernels import as_array

    q = grouped_exact_quantiles(ds, group_col, value_col,
                                qs=(0.25, 0.75), batch_size=batch_size)
    fences = {str(g): (int(q1), int(q3))
              for g, q1, q3 in zip(q[group_col], q["q25"], q["q75"])
              if g is not None and not pd.isna(g)}
    fences_ref = ray.put(fences)

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(id_col, types[id_col]),
                            (group_col, types[group_col]),
                            (value_col, types[value_col]),
                            ("side", pa.string())])

    def flag(b: pa.Table) -> pa.Table:
        fen = ray.get(fences_ref)
        mask = pc.and_(pc.is_valid(b[id_col]),
                       pc.and_(pc.is_valid(b[group_col]),
                               pc.is_valid(b[value_col])))
        b = b.filter(mask)
        if b.num_rows == 0:
            return out_schema.empty_table()
        g = pc.cast(as_array(b[group_col]), pa.string()).to_numpy(
            zero_copy_only=False)
        v = pc.cast(as_array(b[value_col]), pa.int64()).to_numpy(
            zero_copy_only=False)
        gu, gc = np.unique(g.astype(object), return_inverse=True)
        q1 = np.empty(len(gu), dtype=np.int64)
        q3 = np.empty(len(gu), dtype=np.int64)
        known = np.zeros(len(gu), dtype=bool)
        for i, key in enumerate(gu):  # unique groups only
            f = fen.get(str(key))
            if f is not None:
                q1[i], q3[i] = f
                known[i] = True
        iqr = q3 - q1
        lo = (2 * v < 2 * q1[gc] - k_half * iqr[gc]) & known[gc]
        hi = (2 * v > 2 * q3[gc] + k_half * iqr[gc]) & known[gc]
        keep = lo | hi
        if not keep.any():
            return out_schema.empty_table()
        sel = pa.array(np.flatnonzero(keep))
        side = np.where(hi[keep], "high", "low")
        return pa.table({
            id_col: as_array(b[id_col]).take(sel),
            group_col: as_array(b[group_col]).take(sel),
            value_col: as_array(b[value_col]).take(sel),
            "side": pa.array(side, type=pa.string())}).cast(out_schema)

    return ds.map_batches(flag, batch_format="pyarrow",
                          batch_size=batch_size)


def stats_state(ds, keys: list[str], aggs: dict[str, list[str]],
                batch_size: int = 65536,
                partial_budget: int = GROUP_PARTIAL_BUDGET
                ) -> pa.Table:
    """MERGEABLE aggregation state for ``grouped_stats`` — one row per
    group holding the decomposed partials (sum/count/min/max), fully
    reduced.  The incremental-maintenance primitive: persist this
    table per ingest epoch (it is group-cardinality-sized, not
    data-sized) and fold new epochs in with ``merge_stats_states`` —
    updated corpus-wide stats WITHOUT rescanning old epochs, the same
    contract as the W3 drift sketches but for exact algebraic
    aggregates.  ``finalize_stats`` turns any state into the
    ``grouped_stats`` output shape (means derived exactly from
    sum/count at the end, so incremental means are exact too).
    """
    for col, ops in aggs.items():
        bad = set(ops) - {"sum", "count", "min", "max", "mean"}
        if bad:
            raise ValueError(f"non-decomposable ops for {col}: {bad}")
    # mean needs sum+count partials
    full = {c: sorted({o for o in ops if o != "mean"}
                      | ({"sum", "count"} if "mean" in ops else set()))
            for c, ops in aggs.items()}
    partial = _partial_group_agg(keys, full)
    parts_ds = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size).materialize()
    col_ops = {
        c: ("sum" if c.endswith(("_sum", "_count")) else
            "min" if c.endswith("_min") else "max")
        for c in parts_ds.schema().names if c not in keys
    }
    out = _merge_partials(parts_ds, keys, col_ops, partial_budget)
    out = out.sort_values(keys).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def merge_stats_states(states: list[pa.Table],
                       keys: list[str]) -> pa.Table:
    """Fold several ``stats_state`` tables (epochs) into one: sums and
    counts add, mins/maxes extremize — pure algebra over
    group-cardinality-sized tables, no data rescans.  States with
    disjoint groups union cleanly."""
    allp = pa.concat_tables(states, promote_options="default").to_pandas()
    col_ops = {c: ("sum" if c.endswith(("_sum", "_count")) else
                   "min" if c.endswith("_min") else "max")
               for c in allp.columns if c not in keys}
    out = (allp.groupby(keys, as_index=False).agg(col_ops)
           .sort_values(keys).reset_index(drop=True))
    return pa.Table.from_pandas(out, preserve_index=False)


def finalize_stats(state: pa.Table, keys: list[str],
                   aggs: dict[str, list[str]]) -> pd.DataFrame:
    """``stats_state`` / ``merge_stats_states`` → the ``grouped_stats``
    output shape (exact means from sum/count; partial columns the
    caller didn't ask for are dropped)."""
    out = state.to_pandas()
    for col, ops in aggs.items():
        if "mean" in ops:
            out[f"{col}_mean"] = out[f"{col}_sum"] / out[f"{col}_count"]
            if "sum" not in ops:
                out = out.drop(columns=[f"{col}_sum"])
            if "count" not in ops:
                out = out.drop(columns=[f"{col}_count"])
    return out.sort_values(keys).reset_index(drop=True)


def grouped_corr(ds, group_col: str, x_col: str, y_col: str,
                 batch_size: int = 65536,
                 partial_budget: int = GROUP_PARTIAL_BUDGET
                 ) -> pd.DataFrame:
    """Per-group EXACT Pearson-correlation sufficient statistics.

    Emits one row per group with int64 columns ``n, sum_x, sum_y,
    sum_xx, sum_yy, sum_xy`` — the mergeable sufficient statistics of
    covariance/correlation (corr = (n·Σxy − Σx·Σy) /
    √(n·Σxx − Σx²)·√(n·Σyy − Σy²), derivable exactly by the caller).
    Integer-exact by contract: both columns must be integer-VALUED
    (int types, or doubles holding integers — the cast is checked, a
    fractional value raises); the caller owns int64 overflow headroom
    (|x|²·n must fit).  Rows where either value is null are excluded
    (SQL ``corr`` pairwise-deletion semantics); a null group key is its
    own group (SQL GROUP BY).

    Shuffle discipline: per-batch combine emits one row per (group,
    batch) — six int64 sums, never raw rows — and the final merge is
    cardinality-guarded (``_merge_partials``): above ``partial_budget``
    partial rows the merge runs in the hash exchange, so a
    user_id-cardinality group column never lands raw on the driver.
    """
    STATS = ["n", "sum_x", "sum_y", "sum_xx", "sum_yy", "sum_xy"]

    def partial(b: pa.Table) -> pa.Table:
        valid = pc.and_(pc.is_valid(b[x_col]), pc.is_valid(b[y_col]))
        b = b.filter(valid)
        x = pc.cast(b[x_col], pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(b[y_col], pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({
            group_col: b[group_col],
            "n": pa.array(np.ones(len(x), dtype=np.int64)),
            "sum_x": pa.array(x), "sum_y": pa.array(y),
            "sum_xx": pa.array(x * x), "sum_yy": pa.array(y * y),
            "sum_xy": pa.array(x * y),
        })
        agg = t.group_by([group_col], use_threads=False).aggregate(
            [(c, "sum") for c in STATS])
        # aggregate() emits "{col}_sum" columns with the key LAST —
        # reselect by name so the partial schema is key-first + STATS
        return (agg.select([group_col] + [f"{c}_sum" for c in STATS])
                .rename_columns([group_col] + STATS))

    parts_ds = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size).materialize()
    out = _merge_partials(parts_ds, [group_col], {c: "sum" for c in STATS},
                          partial_budget, keep_null_keys=True)
    for c in STATS:
        out[c] = out[c].astype("int64")
    return out.sort_values(group_col).reset_index(drop=True)


def grouping_sets_counts(ds, cols: list[str],
                         sets: list[list[str]]) -> pd.DataFrame:
    """SQL ``GROUP BY GROUPING SETS ((...), ...)`` counts — the
    caller picks exactly which grouping sets to emit (CUBE = all 2^k,
    ROLLUP = prefixes; this is the general form: "by (lang, source),
    by lang, and overall" without paying for the sets nobody asked
    for).  Rolled-up columns are NULL; data-NULL rows drop first
    (rollup_counts/cube_counts policy — CUBE markers and data NULLs
    are indistinguishable in the output).

    Scale shape: shared with ``cube_counts`` — ONE pass of
    finest-level partials over ``cols``; every requested set derives
    from the finest counts driver-side (finest-cardinality × |sets|
    bounded, never row-count)."""
    SEP = "\x1f"
    for s in sets:
        unknown = set(s) - set(cols)
        if unknown:
            raise ValueError(f"grouping set {s} not within {cols}: "
                             f"{sorted(unknown)}")

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.is_valid(b[cols[0]])
        for c in cols[1:]:
            mask = pc.and_(mask, pc.is_valid(b[c]))
        b = b.filter(mask)
        key = pc.cast(b[cols[0]], pa.string())
        for c in cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(b[c], pa.string()), SEP)
        codes, uniq = pd.factorize(
            pd.Series(key.to_numpy(zero_copy_only=False)))
        cnt = np.bincount(codes, minlength=len(uniq))
        return pa.table({"k": pa.array(uniq, type=pa.string()),
                         "c": pa.array(cnt.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    levels = []
    if not len(parts):
        fin = pd.DataFrame({c: pd.Series(dtype=object) for c in cols}
                           | {"n": pd.Series(dtype="int64")})
    else:
        agg = parts.groupby("k", as_index=False)["c"].sum()
        split = agg["k"].str.split(SEP, expand=True)
        split.columns = cols
        fin = pd.concat([split, agg["c"].rename("n")], axis=1)
    for keep in sets:
        keep = [c for c in cols if c in keep]  # canonical order
        if len(fin):
            sub = (fin.groupby(keep, as_index=False)["n"].sum()
                   if keep else
                   pd.DataFrame({"n": [fin["n"].sum()]}))
        else:
            # SQL still emits the grand-total row for the () set
            sub = (pd.DataFrame({"n": [np.int64(0)]}) if not keep
                   else pd.DataFrame({c: pd.Series(dtype=object)
                                      for c in keep}
                                     | {"n": pd.Series(dtype="int64")}))
        for c in cols:
            if c not in keep:
                sub[c] = None
        levels.append(sub[cols + ["n"]])
    out = pd.concat(levels, ignore_index=True)
    return (out.astype({"n": "int64"})
            .sort_values(cols, na_position="last")
            .reset_index(drop=True))


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """UNPIVOT (wide → long): each input row becomes one output row
    per ``value_cols`` member, carrying ``id_cols`` + the column's
    name + its value (SQL ``UNPIVOT`` / pandas ``melt``).  Pure
    streaming map — per batch the id columns concat k times and the
    value columns cast to a common type and stack; no shuffle, no
    driver state.  Value columns must share a castable common type
    (the output has ONE value column)."""
    import pyarrow as _pa

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    vt = types[value_cols[0]]
    for c in value_cols[1:]:
        if types[c] != vt:
            # promote to the widest: rely on Arrow cast at build time
            vt = _pa.int64() if all(
                _pa.types.is_integer(types[c2]) for c2 in value_cols
            ) else _pa.float64()
    out_schema = _pa.schema(
        [(c, types[c]) for c in id_cols]
        + [(var_name, _pa.string()), (value_name, vt)])

    def long(b: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            cols = {i: b[i] for i in id_cols}
            cols[var_name] = pa.array(
                np.full(b.num_rows, c, dtype=object), _pa.string())
            cols[value_name] = pc.cast(b[c], vt)
            parts.append(pa.table(cols).cast(out_schema))
        return pa.concat_tables(parts)

    return ds.map_batches(long, batch_format="pyarrow")


def grouped_regression(ds, keys: list[str], x_col: str, y_col: str,
                       batch_size: int = 65536,
                       partial_budget: int = GROUP_PARTIAL_BUDGET
                       ) -> pd.DataFrame:
    """Per-group simple linear regression (OLS y on x) via EXACT
    integer sufficient statistics — the drift/trend primitive
    ("is sequence length drifting across ingest position?") as a
    grouped aggregate, not a model fit.  SQL ``regr_slope`` semantics:
    rows where either column is NULL are excluded pairwise.

    Returns one row per group: ``n, sum_x, sum_y, sum_xx, sum_xy``
    plus ``slope_num = n·Σxy − Σx·Σy`` and ``slope_den = n·Σxx −
    (Σx)²`` (slope = num/den; kept as exact integers so the result is
    engine-reproducible — the repo's integer-oracle policy; float
    division is the caller's last step).  Both columns are cast to
    int64 first: the caller pre-scales decimals (e.g. cents).
    Overflow contract: ``n·Σxy`` must fit int64 — pre-scale or
    pre-aggregate coarser groups if Σ|x·y| approaches 2⁶³/n.

    Distributed shape: one ``map_batches`` combiner emits per-(batch,
    group) partial sums (Arrow ``group_by`` over appended x², x·y
    columns); the final merge rides the cardinality-guarded
    ``_merge_partials`` — enum-sized keys merge on the driver,
    user-id-sized keys merge in the hash exchange with one row per
    group leaving the tasks.
    """

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[x_col]),
                             pc.is_valid(b[y_col])))
        x = pc.cast(b[x_col], pa.int64())
        y = pc.cast(b[y_col], pa.int64())
        t = pa.table({
            **{k: b[k] for k in keys},
            "__n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "__x": x, "__y": y,
            "__xx": pc.multiply(x, x), "__xy": pc.multiply(x, y)})
        return t.group_by(keys).aggregate(
            [("__n", "sum"), ("__x", "sum"), ("__y", "sum"),
             ("__xx", "sum"), ("__xy", "sum")])

    parts_ds = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size).materialize()
    col_ops = {c: "sum" for c in parts_ds.schema().names
               if c not in keys}
    out = _merge_partials(parts_ds, keys, col_ops, partial_budget)
    out = out.rename(columns={
        "__n_sum": "n", "__x_sum": "sum_x", "__y_sum": "sum_y",
        "__xx_sum": "sum_xx", "__xy_sum": "sum_xy"})
    for c in ("n", "sum_x", "sum_y", "sum_xx", "sum_xy"):
        out[c] = out[c].astype("int64")
    out["slope_num"] = out["n"] * out["sum_xy"] - out["sum_x"] * out["sum_y"]
    out["slope_den"] = out["n"] * out["sum_xx"] - out["sum_x"] ** 2
    return out.sort_values(keys).reset_index(drop=True)


def _kmv_register_global(ds, value_col: str, k: int) -> np.ndarray:
    """Global (ungrouped) KMV register: the ``k`` smallest distinct
    ``md5_number_upper`` hashes of a column.  Per-batch partials are
    register-sized (≤ k rows each), merged once on the driver —
    driver data is O(k × blocks), the sketch contract."""
    import ray

    from ..functions.hashing import md5_u64le

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"h": pa.array([], type=pa.uint64())})
        if b.num_rows == 0 or value_col not in b.column_names:
            return empty
        col = b[value_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.cast(col, pa.string()).drop_null()
        if not len(col):
            return empty
        h = np.unique(md5_u64le(pc.unique(col)))[:k]
        return pa.table({"h": pa.array(h, type=pa.uint64())})

    parts = [t for t in ray.get(
        ds.map_batches(partial, batch_format="pyarrow")
        .to_arrow_refs()) if t.num_rows]
    if not parts:
        return np.empty(0, np.uint64)
    allh = np.unique(np.concatenate(
        [t.column("h").to_numpy(zero_copy_only=False) for t in parts]))
    return allh[:k]


def kmv_overlap(ds_a, ds_b, col_a: str, col_b: str,
                k: int = 128) -> pd.DataFrame:
    """Two-set KMV sketch algebra — estimate |A∪B|, Jaccard and
    |A∩B| between two distinct-value populations from two
    register-sized sketches (Beyer et al. 2007, "On Synopses for
    Distinct-Value Estimation"): union register = k smallest of
    regA ∪ regB (valid because the k smallest of A∪B always lie in
    regA ∪ regB); ρ = |union members present in BOTH registers| / k.
    The cross-source audit ("how much does ingest B duplicate A?")
    at sketch cost — neither side is shuffled, each is scanned once.

    Returns ONE row.  Integer state columns (exactly SQL-restatable,
    the repo's sketch-oracle policy): ``n_reg_a, n_reg_b, n_union,
    n_common, kth_union`` (decimal string — u64) and
    ``union_checksum`` (Σ h mod 1e9+7 over the union register).
    Estimator columns (``est_union``, ``est_intersection``,
    ``jaccard_permille``) use the KMV estimator — float division,
    excluded from oracle comparison; accuracy is pytest-checked.
    """
    MOD = np.uint64(1_000_000_007)
    ra = _kmv_register_global(ds_a, col_a, k)
    rb = _kmv_register_global(ds_b, col_b, k)
    ru = np.unique(np.concatenate([ra, rb]))[:k]
    common = ru[np.isin(ru, ra) & np.isin(ru, rb)]
    n_union = len(ru)
    kth = int(ru[-1]) if n_union else 0
    checksum = int((ru % MOD).astype(np.int64).sum()) if n_union else 0
    if n_union >= k:
        est_union = int((k - 1) * np.float64(2.0 ** 64)
                        / max(float(kth), 1.0))
    else:
        est_union = n_union  # register not full -> exact
    n_common = len(common)
    est_inter = est_union * n_common // max(n_union, 1)
    jac = n_common * 1000 // max(n_union, 1)
    return pd.DataFrame({
        "n_reg_a": pd.array([len(ra)], dtype="int64"),
        "n_reg_b": pd.array([len(rb)], dtype="int64"),
        "n_union": pd.array([n_union], dtype="int64"),
        "n_common": pd.array([n_common], dtype="int64"),
        "kth_union": [str(kth)],
        "union_checksum": pd.array([checksum], dtype="int64"),
        "est_union": pd.array([est_union], dtype="int64"),
        "est_intersection": pd.array([est_inter], dtype="int64"),
        "jaccard_permille": pd.array([jac], dtype="int64")})


def fd_violations(ds, lhs_cols: list[str], rhs_col: str,
                  num_buckets: int = 64):
    """Functional-dependency audit: the data-quality rule "lhs →
    rhs" (every lhs value maps to exactly one rhs), checked at scale
    and reported as violations — one row per lhs value with MORE than
    one distinct rhs, carrying ``n_rhs`` and min/max rhs as evidence.
    The profiling primitive behind key discovery and denormalization
    checks (Papenbrock et al. 2015, "Functional Dependency Discovery:
    An Experimental Evaluation").

    Semantics (SQL): rows with a NULL in ANY lhs column or in rhs are
    ignored (``COUNT(DISTINCT rhs)`` over non-null rhs, null lhs
    names no entity).  min/max evidence uses the rhs column's native
    order (numeric for integers, lexicographic for strings).

    Distributed shape: per-batch DISTINCT (lhs, rhs) pairs (map-side
    dedup bounds the shuffle at distinct pairs, not rows), ONE
    lhs-keyed exchange; each bucket task re-dedups its pairs and
    reduces runs — only violating lhs rows leave the task, so the
    output is violation-sized.  Partitioning assumption (SURVEY
    §2.6): one lhs value's distinct rhs set fits a merge task.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange_ds

    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    rhs_int = pa.types.is_integer(types[rhs_col])
    out_schema = pa.schema(
        [(c, types[c]) for c in lhs_cols]
        + [("n_rhs", pa.int64()),
           ("rhs_min", types[rhs_col]), ("rhs_max", types[rhs_col])])
    SEP = "\x1f"

    def _lhs_key(t: pa.Table):
        k = pc.cast(t[lhs_cols[0]], pa.string())
        for c in lhs_cols[1:]:
            k = pc.binary_join_element_wise(
                k, pc.cast(t[c], pa.string()), SEP)
        return k

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.is_valid(b[rhs_col])
        for c in lhs_cols:
            keep = pc.and_(keep, pc.is_valid(b[c]))
        b = b.select([*lhs_cols, rhs_col]).filter(keep)
        key = _lhs_key(b)
        pair = pc.binary_join_element_wise(
            key, pc.cast(b[rhs_col], pa.string()), SEP)
        pv = pair.to_numpy(zero_copy_only=False).astype(object)
        _, idx = np.unique(pv, return_index=True)
        b = b.take(pa.array(np.sort(idx)))
        bk = md5_u64le(_lhs_key(b)) % np.uint64(num_buckets)
        return b.append_column("__b", pa.array(bk.astype(np.int64)))

    def audit(t: pa.Table) -> pa.Table | None:
        key = _lhs_key(t).to_numpy(
            zero_copy_only=False).astype(object)
        if rhs_int:
            rv = pc.cast(t[rhs_col], pa.int64()).to_numpy(
                zero_copy_only=False)
        else:
            rv = pc.cast(t[rhs_col], pa.string()).to_numpy(
                zero_copy_only=False).astype(object)
        o = np.lexsort((rv, key))
        ks, vs = key[o], rv[o]
        # cross-batch re-dedup of (lhs, rhs) pairs
        keep = np.ones(len(ks), dtype=bool)
        keep[1:] = (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])
        ks, vs, oi = ks[keep], vs[keep], o[keep]
        first = np.ones(len(ks), dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        start = np.flatnonzero(first)
        cnt = np.diff(np.append(start, len(ks)))
        bad = cnt > 1
        if not bad.any():
            return None
        s, c = start[bad], cnt[bad]
        lhs_idx = pa.array(oi[s])
        cols = {cname: t[cname].take(lhs_idx) for cname in lhs_cols}
        cols["n_rhs"] = pa.array(c.astype(np.int64))
        cols["rhs_min"] = t[rhs_col].take(pa.array(oi[s]))
        cols["rhs_max"] = t[rhs_col].take(pa.array(oi[s + c - 1]))
        return pa.table(cols).cast(out_schema)

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_exchange_ds(tagged, "__b", num_buckets, audit,
                               empty_schema=out_schema)


def _cm_sketch(ds, col: str, width: int, depth: int) -> np.ndarray:
    """Count-Min sketch of a key column as a dense (depth, width)
    int64 array.  Hash contract: md5_number_upper u64 split into
    (h1, h2), row-*j* position = ``(h1 + j·h2) mod width`` — the same
    Kirsch-Mitzenmacher double hashing as the repo's Bloom filters,
    so the register is exactly SQL-restatable.  Per-batch partials
    are (j, p, c) long rows (≤ depth·width per batch); the final sum
    rides the cardinality-guarded ``_merge_partials``."""
    from ..functions.hashing import md5_u64le

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"j": pa.array([], pa.int64()),
                          "p": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if b.num_rows == 0 or col not in b.column_names:
            return empty
        v = b[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        v = pc.cast(v, pa.string()).drop_null()
        if not len(v):
            return empty
        sv = v.to_numpy(zero_copy_only=False).astype(object)
        uv, cnt = np.unique(sv, return_counts=True)
        h = md5_u64le(pa.array(uv, type=pa.string()))
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        h2 = (h >> np.uint64(32)).astype(np.int64)
        js, ps, cs = [], [], []
        for j in range(depth):
            pos = (h1 + j * h2) % width
            up, inv = np.unique(pos, return_inverse=True)
            s = np.zeros(len(up), dtype=np.int64)
            np.add.at(s, inv, cnt)
            js.append(np.full(len(up), j, dtype=np.int64))
            ps.append(up)
            cs.append(s)
        return pa.table({"j": pa.array(np.concatenate(js)),
                         "p": pa.array(np.concatenate(ps)),
                         "c": pa.array(np.concatenate(cs))})

    parts_ds = ds.map_batches(partial,
                              batch_format="pyarrow").materialize()
    merged = _merge_partials(parts_ds, ["j", "p"], {"c": "sum"})
    dense = np.zeros((depth, width), dtype=np.int64)
    if len(merged):
        dense[merged["j"].astype(np.int64),
              merged["p"].astype(np.int64)] = merged["c"].astype(
            np.int64)
    return dense


def join_size_estimate(ds_a, ds_b, col_a: str, col_b: str,
                       width: int = 4096, depth: int = 4
                       ) -> pd.DataFrame:
    """Pre-shuffle join-size estimation: |A ⋈ B| on an equality key
    from two Count-Min sketches — ``min_j Σ_p A_j[p]·B_j[p]``, the
    CM inner-product estimate (Cormode & Muthukrishnan 2005), never
    an underestimate.  The planning primitive you run BEFORE
    committing a 100 TB shuffle join: each side is scanned once at
    sketch cost (depth·width ints), nothing is shuffled, and the
    estimate (plus per-side row counts) decides broadcast vs shuffle
    vs salt.

    Returns ONE row, all int64 and exactly SQL-restatable: ``est``
    (the min), ``ip_0..ip_{depth-1}`` (per-row inner products),
    ``n_a``, ``n_b`` (non-null key rows — also each sketch row's
    column sum, pinning totals).  NULL keys are excluded (they join
    nothing).  Overflow contract: Σ c_A·c_B must fit int64 — true
    whenever the real join output would be addressable.
    """
    A = _cm_sketch(ds_a, col_a, width, depth)
    B = _cm_sketch(ds_b, col_b, width, depth)
    ips = (A * B).sum(axis=1)
    cols = {"est": pd.array([int(ips.min())], dtype="int64")}
    for j in range(depth):
        cols[f"ip_{j}"] = pd.array([int(ips[j])], dtype="int64")
    cols["n_a"] = pd.array([int(A[0].sum())], dtype="int64")
    cols["n_b"] = pd.array([int(B[0].sum())], dtype="int64")
    return pd.DataFrame(cols)


def column_overlap_matrix(named: dict, k: int = 128) -> pd.DataFrame:
    """Schema-matching profile: pairwise value-overlap estimates
    between ANY set of columns across tables, from one KMV register
    per column (``named`` maps a label to ``(ds, col)``).  The
    join-key discovery / data-catalog primitive ("which columns share
    a domain?") at sketch cost — each column is scanned once, then
    every pair is resolved driver-side from register algebra
    (``kmv_overlap``'s rule: union register = k smallest of the two,
    common = union members present in both).

    Returns one row per unordered label pair (labels sorted):
    ``col_a, col_b, n_reg_a, n_reg_b, n_union, n_common`` — all
    integer register state, exactly SQL-restatable.
    """
    regs = {name: _kmv_register_global(ds, col, k)
            for name, (ds, col) in named.items()}
    rows = []
    for a, b in ((x, y) for x in sorted(regs) for y in sorted(regs)
                 if x < y):
        ra, rb = regs[a], regs[b]
        ru = np.unique(np.concatenate([ra, rb]))[:k]
        common = int((np.isin(ru, ra) & np.isin(ru, rb)).sum())
        rows.append((a, b, len(ra), len(rb), len(ru), common))
    return pd.DataFrame(rows, columns=[
        "col_a", "col_b", "n_reg_a", "n_reg_b", "n_union",
        "n_common"]).astype({c: "int64" for c in
                             ("n_reg_a", "n_reg_b", "n_union",
                              "n_common")})


def map_key_stats(ds, map_col: str, num_buckets: int = 16
                  ) -> pd.DataFrame:
    """Profile a ``map<string,string>`` column: per distinct KEY, how
    many rows carry it (``n_rows``) and how many distinct values it
    takes (``n_vals``) — the nested-type profiling step before
    promoting dynamic attributes to real columns (keys unique per row
    by Arrow map semantics, so entry count = row count).  Null map
    rows contribute nothing; a present key with a null value counts
    the row but not a value.

    Distributed shape: each batch flattens its MapArray with
    zero-copy offsets (keys/items child arrays — no per-row Python)
    and collapses to distinct (key, value, partial_count) rows; ONE
    key-keyed exchange merges counts and counts distinct values.
    Output is key-space-sized.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"__b": pa.array([], pa.int64()),
                          "k": pa.array([], pa.string()),
                          "v": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        if b.num_rows == 0 or map_col not in b.column_names:
            return empty
        col = b[map_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if not len(col) or col.null_count == len(col):
            return empty
        # this pyarrow has no list_flatten kernel for maps; slice the
        # raw child arrays to the offsets window instead (bare
        # .keys/.items can leak out-of-slice entries on sliced
        # arrays — the window [off[0], off[-1]) is exactly the
        # referenced entry range, null slots being empty ranges)
        off = col.offsets.to_numpy(zero_copy_only=False)
        lo, hi = int(off[0]), int(off[-1])
        keys = col.keys[lo:hi].to_numpy(
            zero_copy_only=False).astype(object)
        vals = col.items[lo:hi].to_pandas().to_numpy(dtype=object)
        if not len(keys):
            return empty
        # null values -> sentinel excluded from distinct-value counts
        vv = np.where(pd.isna(vals), "\x00null", vals.astype(object))
        pair = keys + "\x1f" + vv
        u, c = np.unique(pair, return_counts=True)
        sp = np.array([x.split("\x1f", 1) for x in u], dtype=object)
        karr = pa.array(sp[:, 0], pa.string())
        bk = md5_u64le(karr) % np.uint64(num_buckets)
        return pa.table({"__b": pa.array(bk.astype(np.int64)),
                         "k": karr,
                         "v": pa.array(sp[:, 1], pa.string()),
                         "c": pa.array(c.astype(np.int64))})

    def merge(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False).astype(object)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(object)
        c = t.column("c").to_numpy(zero_copy_only=False)
        pair = k + "\x1f" + v
        u, inv = np.unique(pair, return_inverse=True)
        cs = np.zeros(len(u), dtype=np.int64)
        np.add.at(cs, inv, c)
        ku = np.array([x.split("\x1f", 1)[0] for x in u],
                      dtype=object)
        vu = np.array([x.split("\x1f", 1)[1] for x in u],
                      dtype=object)
        uk, kinv = np.unique(ku, return_inverse=True)
        n_rows = np.zeros(len(uk), dtype=np.int64)
        np.add.at(n_rows, kinv, cs)
        n_vals = np.zeros(len(uk), dtype=np.int64)
        np.add.at(n_vals, kinv, (vu != "\x00null").astype(np.int64))
        return pa.table({"k": pa.array(uk, pa.string()),
                         "n_rows": pa.array(n_rows),
                         "n_vals": pa.array(n_vals)})

    tagged = ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, merge)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"key": pd.Series(dtype=object),
                             "n_rows": pd.Series(dtype="int64"),
                             "n_vals": pd.Series(dtype="int64")})
    df = res.to_pandas().rename(columns={"k": "key"})
    return (df.sort_values("key").reset_index(drop=True)
            .astype({"n_rows": "int64", "n_vals": "int64"}))


def cusum_alarms(ds, key_col: str, order_col: str, value_col: str,
                 k: int, h: int, num_buckets: int = 16
                 ) -> pd.DataFrame:
    """One-sided CUSUM changepoint statistic per key (Page 1954):
    ``s_t = max(0, s_{t-1} + x_t − k)``, alarm when ``s_t > h`` — the
    sequential drift detector for "did this source's daily volume /
    quality metric shift upward?".  Exact integers throughout.

    Vectorization identity (no sequential loop): with ``c_t =
    Σ_{i≤t}(x_i − k)``, ``s_t = c_t − min(0, min_{j≤t} c_j)`` — one
    cumsum plus one running minimum per key.  The same identity is
    restated in SQL (``SUM OVER`` − ``LEAST(0, MIN(SUM OVER) OVER)``),
    so the oracle pins every statistic value.  Null key/order/value
    rows drop; ties on ``order_col`` within a key are invalid input
    (the statistic is order-defined) — callers pre-aggregate to the
    grain first.

    Distributed shape: ONE key-keyed exchange; per bucket one lexsort
    + cumsum + ``np.minimum.accumulate`` with per-key offset resets.
    Returns (key, order, value, s, alarm) sorted.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                               pc.is_valid(b[order_col])),
                       pc.is_valid(b[value_col]))
        b = b.select([key_col, order_col, value_col]).filter(keep)
        hv = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((hv % np.uint64(num_buckets))
                            .astype(np.int64)))

    def stat(t: pa.Table) -> pa.Table:
        g = pc.cast(t[key_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        o = pc.cast(t[order_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        x = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        srt = np.lexsort((o, g))
        gs, os_, xs = g[srt], o[srt], x[srt]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = gs[1:] != gs[:-1]
        start = np.flatnonzero(first)
        cnt = np.diff(np.append(start, len(gs)))
        d = xs - k
        csum = np.cumsum(d)
        offs = np.repeat(
            np.concatenate([[0], csum[start[1:] - 1]]), cnt)
        c = csum - offs
        # per-key running min via offset trick on minimum.accumulate:
        # reset by adding +inf-like bumps is messy; do per-key via
        # np.minimum.accumulate on a copy with key boundaries broken
        # per-key running min: numpy has no offset trick for min (it
        # doesn't invert like cumsum), so accumulate per SEGMENT —
        # one vectorized accumulate call per key, never per row
        run_min = np.empty_like(c)
        for s0, c0 in zip(start, cnt):
            run_min[s0:s0 + c0] = np.minimum.accumulate(c[s0:s0 + c0])
        s_stat = c - np.minimum(0, run_min)
        return pa.table({
            key_col: pa.array(gs, pa.string()),
            order_col: pa.array(os_),
            value_col: pa.array(xs),
            "s": pa.array(s_stat.astype(np.int64)),
            "alarm": pa.array((s_stat > h).astype(np.int64))})

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, stat)
    cols = [key_col, order_col, value_col, "s", "alarm"]
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    df = res.to_pandas()
    return (df.sort_values([key_col, order_col])
            .reset_index(drop=True))


def generalize_k_anonymous(ds, levels: list[list[str]], k: int,
                           partial_budget: int = GROUP_PARTIAL_BUDGET
                           ) -> pd.DataFrame:
    """K-anonymity GENERALIZATION ladder — the repair companion to
    the `events_k_anonymity` audit (Sweeney 2002): quasi-identifier
    classes are released at the finest level where they reach ``k``
    rows; classes still below ``k`` at a level regroup their rows at
    the next (coarser) level; rows failing the last level are
    SUPPRESSED (one residual row).  ``levels`` is the generalization
    hierarchy, finest first (e.g. ``[[type, day], [type, week],
    [type]]``).  Returns (lvl int64, class string — '|'-joined key
    values, n int64), deterministic and exactly SQL-restatable.

    Distributed shape: one cardinality-guarded grouped count per
    level over the still-unreleased rows; the failing-class filter
    broadcasts the failing CLASS KEYS (class-space-sized — bounded by
    the quasi-identifier domain, never row count) via ``ray.put`` and
    applies as a streaming isin.  Rows are scanned once per level
    (≤ len(levels) passes), never shuffled.

    ``ds`` must be materialized-or-rescannable.
    """
    import ray

    SEP = "|"

    def class_of(b: pa.Table, cols: list[str]):
        s = pc.cast(b[cols[0]], pa.string())
        for c in cols[1:]:
            s = pc.binary_join_element_wise(
                s, pc.cast(b[c], pa.string()), SEP)
        return s

    out_rows = []
    cur = ds
    for lvl, cols in enumerate(levels):
        def count_partial(b: pa.Table, _cols=tuple(cols)) -> pa.Table:
            keep = pc.is_valid(b[_cols[0]])
            for c in _cols[1:]:
                keep = pc.and_(keep, pc.is_valid(b[c]))
            b = b.filter(keep)
            cls = class_of(b, list(_cols))
            u, c_ = np.unique(
                cls.to_numpy(zero_copy_only=False).astype(object),
                return_counts=True)
            return pa.table({"cls": pa.array(u, pa.string()),
                             "n": pa.array(c_.astype(np.int64))})

        parts = cur.map_batches(count_partial,
                                batch_format="pyarrow").materialize()
        counts = _merge_partials(parts, ["cls"], {"n": "sum"},
                                 partial_budget)
        if not len(counts):
            break
        counts["n"] = counts["n"].astype("int64")
        kept = counts[counts.n >= k]
        for _, r in kept.iterrows():
            out_rows.append((lvl, r.cls, int(r.n)))
        failing = np.sort(counts[counts.n < k]["cls"]
                          .to_numpy(dtype=object))
        if not len(failing):
            break
        if lvl == len(levels) - 1:
            out_rows.append((lvl + 1, "__suppressed",
                             int(counts[counts.n < k].n.sum())))
            break
        ref = ray.put(failing)

        def still_failing(b: pa.Table, _cols=tuple(cols)) -> pa.Table:
            f = ray.get(ref)
            keep = pc.is_valid(b[_cols[0]])
            for c in _cols[1:]:
                keep = pc.and_(keep, pc.is_valid(b[c]))
            b = b.filter(keep)
            cls = class_of(b, list(_cols)).to_numpy(
                zero_copy_only=False).astype(object)
            pos = np.searchsorted(f, cls)
            pos[pos == len(f)] = 0
            return b.filter(pa.array(f[pos] == cls))

        cur = cur.map_batches(still_failing,
                              batch_format="pyarrow").materialize()

    df = pd.DataFrame(out_rows, columns=["lvl", "class", "n"])
    return (df.sort_values(["lvl", "class"]).reset_index(drop=True)
            .astype({"lvl": "int64", "n": "int64"}))


def key_skew_profile(ds, key_cols: list[str],
                     num_buckets: int = 64) -> pd.DataFrame:
    """Shuffle-planning SKEW diagnostic — for each candidate key
    column: non-null row count, exact distinct count, the hottest key
    and its share in permille (``1000·top1_n // n_rows``, exact
    integers).  This is the number that predicts hash-exchange hot
    buckets (the ``max_bucket_rows`` guard's remediation table):
    top1_permille ≥ 1000/num_buckets means ONE merge task owns that
    key no matter how many buckets you buy.  Ties on the hot key break
    to the lexicographically smallest key string (SQL ``ORDER BY n
    DESC, key ASC LIMIT 1``).  Null keys drop (they route nowhere).

    Distributed shape: per-batch value-count partials (key repetition
    never leaves the block); ONE (col, key)-keyed exchange; each
    bucket emits ONE summary row per column (n_keys, n_rows, its own
    top key), so the driver merge is buckets × columns rows.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        cols, keys, ns = [], [], []
        for c in key_cols:
            s = pc.cast(b[c], pa.string())
            arr = s.drop_null().to_numpy(zero_copy_only=False).astype(object)
            if not len(arr):
                continue
            u, cnt = np.unique(arr, return_counts=True)
            cols.append(np.full(len(u), c, dtype=object))
            keys.append(u)
            ns.append(cnt.astype(np.int64))
        if not cols:
            return pa.table({"__b": pa.array([], pa.int64()),
                             "col": pa.array([], pa.string()),
                             "key": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        col = np.concatenate(cols)
        key = np.concatenate(keys)
        n = np.concatenate(ns)
        tag = pa.array(col + "\x1f" + key, type=pa.string())
        h = md5_u64le(tag)
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets)).astype(np.int64)),
            "col": pa.array(col, type=pa.string()),
            "key": pa.array(key, type=pa.string()),
            "n": pa.array(n)})

    def summarize(t: pa.Table) -> pa.Table:
        col = t.column("col").to_numpy(zero_copy_only=False).astype(object)
        key = t.column("key").to_numpy(zero_copy_only=False).astype(object)
        n = t.column("n").to_numpy(zero_copy_only=False)
        tag = col + "\x1f" + key
        ut, inv = np.unique(tag, return_inverse=True)
        tot = np.zeros(len(ut), dtype=np.int64)
        np.add.at(tot, inv, n)
        # first row index of each unique tag gives (col, key)
        first = np.zeros(len(ut), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(tag) - 1, -1, -1)
        ucol, ukey = col[first], key[first]
        out_c, out_k, out_n, out_d, out_r = [], [], [], [], []
        for c in np.unique(ucol):
            m = ucol == c
            nt, kt = tot[m], ukey[m]
            # hottest key, ties to smallest key string
            o = np.lexsort((kt, -nt))
            out_c.append(c); out_k.append(kt[o[0]])
            out_n.append(nt[o[0]]); out_d.append(int(m.sum()))
            out_r.append(int(nt.sum()))
        return pa.table({
            "col": pa.array(out_c, type=pa.string()),
            "top_key": pa.array(out_k, type=pa.string()),
            "top_n": pa.array(np.asarray(out_n, dtype=np.int64)),
            "n_keys": pa.array(np.asarray(out_d, dtype=np.int64)),
            "n_rows": pa.array(np.asarray(out_r, dtype=np.int64))})

    tagged = (ds.select_columns(key_cols)
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, summarize)
    empty = pd.DataFrame({
        "column": pd.Series(dtype=object),
        "n_rows": pd.Series(dtype="int64"),
        "n_distinct": pd.Series(dtype="int64"),
        "top1_key": pd.Series(dtype=object),
        "top1_n": pd.Series(dtype="int64"),
        "top1_permille": pd.Series(dtype="int64")})
    if res is None or res.num_rows == 0:
        return empty
    df = res.to_pandas()
    rows = []
    for c, g in df.groupby("col"):
        g = g.sort_values(["top_n", "top_key"],
                          ascending=[False, True], kind="stable")
        n_rows = int(g.n_rows.sum())
        rows.append({"column": c, "n_rows": n_rows,
                     "n_distinct": int(g.n_keys.sum()),
                     "top1_key": g.top_key.iloc[0],
                     "top1_n": int(g.top_n.iloc[0]),
                     "top1_permille": 1000 * int(g.top_n.iloc[0]) // n_rows})
    return (pd.DataFrame(rows).sort_values("column")
            .reset_index(drop=True))


def minmax_permille(ds, value_col: str, group_col: str,
                    id_col: str):
    """Per-group MIN-MAX normalization to integer permille — the
    score-scaling move before cross-group mixing (quality scores are
    only comparable within a language; normalize before a global
    threshold): ``permille = (v − gmin)·1000 // (gmax − gmin)``, exact
    integers (numerator ≥ 0, so numpy ``//`` and SQL ``//`` agree);
    a degenerate group (gmax == gmin) maps to 0.  A null group is its
    OWN group (SQL window partition semantics); null value rows drop.
    Returns a Dataset (id, group, value, permille) — corpus-sized, so
    it stays resident.

    Distributed shape: pass 1 reduces each batch to per-group
    (min, max) partials (group-cardinality-sized driver merge — the
    enum-group assumption of ``_merge_partials``); the group table
    broadcasts once via ``ray.put``; pass 2 is a pure streaming map.
    """
    import ray

    def bounds(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[value_col]))
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        gs = pc.cast(b[group_col], pa.string())
        flag = pc.if_else(pc.is_null(gs), pa.scalar("1"), pa.scalar("0"))
        enc = pc.binary_join_element_wise(flag, pc.fill_null(gs, ""), "")
        g = enc.to_numpy(zero_copy_only=False).astype(object)
        v = pc.cast(b[value_col], pa.int64()).to_numpy(zero_copy_only=False)
        u, inv = np.unique(g, return_inverse=True)
        lo = np.full(len(u), np.iinfo(np.int64).max, dtype=np.int64)
        hi = np.full(len(u), np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(lo, inv, v)
        np.maximum.at(hi, inv, v)
        return pa.table({"g": pa.array(u, type=pa.string()),
                         "lo": pa.array(lo), "hi": pa.array(hi)})

    parts = (ds.select_columns([group_col, value_col])
             .map_batches(bounds, batch_format="pyarrow").to_pandas())
    if not len(parts):
        agg = pd.DataFrame({"g": [], "lo": [], "hi": []})
    else:
        agg = parts.groupby("g", as_index=False).agg(
            lo=("lo", "min"), hi=("hi", "max"))
    table_ref = ray.put({r.g: (int(r.lo), int(r.hi))
                         for r in agg.itertuples()})

    def apply(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[value_col]))
        tbl = ray.get(table_ref)
        gs = pc.cast(b[group_col], pa.string())
        flag = pc.if_else(pc.is_null(gs), pa.scalar("1"), pa.scalar("0"))
        enc = (pc.binary_join_element_wise(flag, pc.fill_null(gs, ""), "")
               .to_numpy(zero_copy_only=False).astype(object))
        v = pc.cast(b[value_col], pa.int64()).to_numpy(zero_copy_only=False)
        # dict lookups only per UNIQUE group (enum-sized), then gather
        u, inv = np.unique(enc, return_inverse=True)
        los = np.asarray([tbl[g][0] for g in u], dtype=np.int64)
        his = np.asarray([tbl[g][1] for g in u], dtype=np.int64)
        lo, hi = los[inv], his[inv]
        span = hi - lo
        perm = np.where(span > 0, (v - lo) * 1000 // np.maximum(span, 1), 0)
        return pa.table({id_col: b[id_col], group_col: b[group_col],
                         value_col: b[value_col],
                         "permille": pa.array(perm.astype(np.int64))})

    return ds.map_batches(apply, batch_format="pyarrow")


def psi_bins(cur_ds, ref_ds, col: str, n_bins: int = 8) -> pd.DataFrame:
    """Population-stability (PSI) BIN COUNTS: equi-depth cut points
    derived from the REFERENCE epoch (``select.equidepth_bins``'s
    ties-share-a-fate rule: cut_i = smallest value with
    ``cum·B ≥ i·total``; bin = #cuts < v, duplicate cuts counted), then
    exact per-bin counts for both epochs.  Returns ``(bin, ref_n,
    cur_n)`` for every bin non-empty in either epoch — the integer
    surface of PSI; the caller applies its own ``Σ (c%−r%)·ln(c%/r%)``
    on shares (floats stay out of the oracle, repo policy).  Nulls
    drop (histogram contract).

    Scale shape: two ``value_counts`` streaming passes (per-batch
    ``np.unique`` partials, driver data bounded by distinct values);
    rows never shuffle; the cut array is ``n_bins−1`` integers.
    """
    from .select import value_counts

    empty = pd.DataFrame({c: pd.Series(dtype="int64")
                          for c in ("bin", "ref_n", "cur_n")})
    rv, rc = value_counts(ref_ds, col)
    if not len(rv):
        return empty
    cum = np.cumsum(rc)
    total = int(cum[-1])
    i = np.arange(1, n_bins, dtype=np.int64)
    cuts = rv[np.searchsorted(cum * n_bins, i * total, side="left")]

    def bin_counts(vals, counts):
        out = np.zeros(n_bins, dtype=np.int64)
        if len(vals):
            np.add.at(out, np.searchsorted(cuts, vals, side="left"),
                      counts)
        return out

    cv, cc = value_counts(cur_ds, col)
    rn, cn = bin_counts(rv, rc), bin_counts(cv, cc)
    keep = (rn > 0) | (cn > 0)
    return pd.DataFrame({"bin": np.flatnonzero(keep).astype(np.int64),
                         "ref_n": rn[keep], "cur_n": cn[keep]})


def coverage_audit(ds, key_col: str, val_col: str,
                   max_distinct: int, num_buckets: int = 64
                   ) -> pd.DataFrame:
    """Referential COVERAGE audit: keys backed by FEWER than
    ``max_distinct`` distinct values — single-sourced parts, users
    seen from < k devices, labels with < k annotators; the
    supply-risk / redundancy check over any (key, value) relation.
    Null key/value rows drop.  Returns ``(key, n_distinct)`` for the
    under-covered keys only, sorted by key (int64 keys — the fact-
    table FK contract).

    Distributed shape: each batch collapses to DISTINCT (key, value)
    pairs; ONE key-keyed exchange re-dedups across batches and counts
    per key; only under-covered keys leave the tasks.
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        b = b.select([key_col, val_col])
        b = b.filter(pc.and_(pc.is_valid(b[key_col]),
                             pc.is_valid(b[val_col])))
        k = pc.cast(b[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        v = pc.cast(b[val_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        kv = np.unique(np.rec.fromarrays([k, v], names=["k", "v"]))
        return pa.table({
            "__b": pa.array((kv["k"].astype(np.uint64)
                             % np.uint64(num_buckets)).astype(np.int64)),
            "k": pa.array(kv["k"]), "v": pa.array(kv["v"])})

    def count(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        kv = np.unique(np.rec.fromarrays([k, v], names=["k", "v"]))
        uk, cnt = np.unique(kv["k"], return_counts=True)
        keep = cnt < max_distinct
        return pa.table({key_col: pa.array(uk[keep]),
                         "n_distinct": pa.array(
                             cnt[keep].astype(np.int64))})

    tagged = ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, count)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({key_col: pd.Series(dtype="int64"),
                             "n_distinct": pd.Series(dtype="int64")})
    return (res.to_pandas().sort_values(key_col)
            .reset_index(drop=True))


def simpson_diversity(ds, group_col: str, class_col: str
                      ) -> pd.DataFrame:
    """Per-group DIVERSITY audit — the integer surface of Simpson's
    index: for each group, ``n`` (non-null class rows), ``same_pairs``
    = Σ_c n_c·(n_c−1) (ordered same-class pairs: Simpson's numerator;
    D = 1 − same_pairs/(n·(n−1)) on the caller's side) and
    ``n_classes`` (exact distinct classes) — the "is this source a
    monoculture" check training mixes need before reweighting.  Null
    group is its own group; null class rows drop.  Returns ``(group,
    n, same_pairs, n_classes)`` sorted by group.

    Scale shape: each batch reduces to (group, class, count) partials
    (class repetition never leaves the block); driver merge is
    groups × classes rows — the enum-class assumption
    (``_merge_partials``'s contract; route through the exchange above
    that).
    """
    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[class_col]))
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "c": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        gs = pc.cast(b[group_col], pa.string())
        flag = pc.if_else(pc.is_null(gs), pa.scalar("1"), pa.scalar("0"))
        g = (pc.binary_join_element_wise(flag, pc.fill_null(gs, ""), "")
             .to_numpy(zero_copy_only=False).astype(object))
        c = pc.cast(b[class_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        tag = g + "\x1f" + c
        ut, inv = np.unique(tag, return_inverse=True)
        cnt = np.bincount(inv).astype(np.int64)
        first = np.zeros(len(ut), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(tag) - 1, -1, -1)
        return pa.table({"g": pa.array(g[first], type=pa.string()),
                         "c": pa.array(c[first], type=pa.string()),
                         "n": pa.array(cnt)})

    parts = (ds.select_columns([group_col, class_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if not len(parts):
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64"),
                             "same_pairs": pd.Series(dtype="int64"),
                             "n_classes": pd.Series(dtype="int64")})
    gc = parts.groupby(["g", "c"], as_index=False)["n"].sum()
    rows = []
    for g, grp in gc.groupby("g"):
        n_c = grp.n.to_numpy(np.int64)
        rows.append({
            "g": g, "n": int(n_c.sum()),
            "same_pairs": int((n_c * (n_c - 1)).sum()),
            "n_classes": int(len(n_c))})
    out = pd.DataFrame(rows)
    out[group_col] = [None if s[0] == "1" else s[1:] for s in out.g]
    return (out.drop(columns=["g"])
            [[group_col, "n", "same_pairs", "n_classes"]]
            .astype({"n": "int64", "same_pairs": "int64",
                     "n_classes": "int64"})
            .sort_values(group_col, na_position="last")
            .reset_index(drop=True))


def gini_numerator(ds, group_col: str, value_col: str
                   ) -> pd.DataFrame:
    """Per-group INEQUALITY audit — the exact-integer Gini surface:
    ``gini_num = Σ_{i<j} |x_i − x_j| = Σ_i (2·rn_i − n − 1)·x_(i)``
    (rn 1-based over the sorted values; tie-invariant because tied
    values share x), plus ``n`` and ``sum_v`` — Gini = gini_num /
    (n·sum_v) on the caller's side.  The token-budget-concentration
    check ("do 1% of docs hold 50% of the chars?").  Null values
    drop; null group is its own group.  Returns ``(group, n, sum_v,
    gini_num)`` sorted by group.

    Scale shape: (group, value, count) histogram partials (the exact-
    quantile contract — driver data bounded by groups × distinct
    values); the rank-weighted sum derives from each group's
    cumulative histogram, vectorized.
    """
    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[value_col]))
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], pa.string()),
                             "v": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        gs = pc.cast(b[group_col], pa.string())
        flag = pc.if_else(pc.is_null(gs), pa.scalar("1"), pa.scalar("0"))
        g = (pc.binary_join_element_wise(flag, pc.fill_null(gs, ""), "")
             .to_numpy(zero_copy_only=False).astype(object))
        v = pc.cast(b[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        df = (pd.DataFrame({"g": g, "v": v})
              .groupby(["g", "v"], as_index=False).size())
        return pa.table({"g": pa.array(df.g.to_numpy(),
                                       type=pa.string()),
                         "v": pa.array(df.v.to_numpy(np.int64)),
                         "n": pa.array(df["size"].to_numpy(np.int64))})

    parts = (ds.select_columns([group_col, value_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if not len(parts):
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64"),
                             "sum_v": pd.Series(dtype="int64"),
                             "gini_num": pd.Series(dtype="int64")})
    hist = parts.groupby(["g", "v"], as_index=False)["n"].sum()
    rows = []
    for g, grp in hist.groupby("g"):
        grp = grp.sort_values("v")
        v = grp.v.to_numpy(np.int64)
        c = grp.n.to_numpy(np.int64)
        n = int(c.sum())
        # ranks of a run of c equal values starting after `before`:
        # sum of (2·rn − n − 1) over the run = c·(2·before + c − n)
        before = np.concatenate([[0], np.cumsum(c)[:-1]])
        coef = c * (2 * before + c - n)
        rows.append({"g": g, "n": n, "sum_v": int((v * c).sum()),
                     "gini_num": int((coef * v).sum())})
    out = pd.DataFrame(rows)
    out[group_col] = [None if s[0] == "1" else s[1:] for s in out.g]
    return (out.drop(columns=["g"])
            [[group_col, "n", "sum_v", "gini_num"]]
            .astype({"n": "int64", "sum_v": "int64",
                     "gini_num": "int64"})
            .sort_values(group_col, na_position="last")
            .reset_index(drop=True))


def rfm_scores(events_ds, n_tiles: int = 5, key_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value",
               num_buckets: int = 32) -> pd.DataFrame:
    """RFM customer scoring — the classic engagement segmentation:
    per key, NTILE(``n_tiles``) buckets over Recency (max event µs),
    Frequency (event count) and Monetary (Σ floor(value·1000),
    exact-integer milli-units), each ordered ``(metric ASC, key ASC)``
    (SQL NTILE's deterministic form).  One filter contract for all
    three metrics: rows with null key/ts/value drop.  Returns
    ``(key, r_score, f_score, m_score)`` sorted by key —
    key-cardinality output.

    Distributed shape: ONE key-keyed exchange reduces events to
    per-key (r, f, m) aggregate rows that STAY resident; each metric
    then ranks through :func:`select.global_rank` (value-counting
    pass + score-keyed exchange — no global sort); the NTILE label is
    arithmetic on (rank, total).  Driver data is output-sized.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange_ds
    from .select import global_rank

    agg_schema = pa.schema([(key_col, pa.int64()), ("r", pa.int64()),
                            ("f", pa.int64()), ("m", pa.int64())])

    def tag(b: pa.Table) -> pa.Table:
        b = b.select([key_col, ts_col, value_col])
        b = b.filter(pc.and_(pc.and_(pc.is_valid(b[key_col]),
                                     pc.is_valid(b[ts_col])),
                             pc.is_valid(b[value_col])))
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def agg(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        vm = np.floor(t[value_col].to_numpy(
            zero_copy_only=False).astype(np.float64) * 1000.0
        ).astype(np.int64)
        uk, inv = np.unique(k, return_inverse=True)
        r = np.full(len(uk), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(r, inv, ts)
        f = np.bincount(inv).astype(np.int64)
        m = np.zeros(len(uk), dtype=np.int64)
        np.add.at(m, inv, vm)
        return pa.table({key_col: pa.array(uk), "r": pa.array(r),
                         "f": pa.array(f),
                         "m": pa.array(m)}).cast(agg_schema)

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    agg_ds = grouped_exchange_ds(tagged, "__b", num_buckets, agg,
                                 empty_schema=agg_schema).materialize()

    total = agg_ds.count()
    if total == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             (key_col, "r_score", "f_score", "m_score")})

    def ntile_of(rank: np.ndarray) -> np.ndarray:
        # SQL NTILE: first total%n tiles hold total//n + 1 rows
        small, rem = divmod(total, n_tiles)
        cut = rem * (small + 1)
        r0 = rank - 1
        return np.where(
            r0 < cut, r0 // max(small + 1, 1) + 1,
            rem + (r0 - cut) // max(small, 1) + 1).astype(np.int64)

    out = None
    for metric, name in (("r", "r_score"), ("f", "f_score"),
                         ("m", "m_score")):
        ranked = global_rank(agg_ds, metric, key_col,
                             values=[key_col]).to_pandas()
        ranked[name] = ntile_of(ranked["rank"].to_numpy(np.int64))
        ranked = ranked[[key_col, name]]
        out = ranked if out is None else out.merge(ranked, on=key_col)
    return (out.astype({key_col: "int64", "r_score": "int64",
                        "f_score": "int64", "m_score": "int64"})
            .sort_values(key_col).reset_index(drop=True))


def crosstab_margins(ds, row_col: str, col_col: str) -> pd.DataFrame:
    """Contingency table WITH margins — the integer surface of the
    chi-square independence audit (is `lang` independent of `source`?
    expected count = row_n·col_n/total; the caller divides): one row
    per observed (row, col) cell with ``n`` (cell count), ``row_n``,
    ``col_n`` and ``total`` attached.  Null row/col values drop.
    Sorted (row, col).

    Scale shape: per-batch (row, col, count) partials; driver merge is
    cells-sized (enum × enum — the ``_merge_partials`` contract);
    margins derive from the merged cell table, no second pass.
    """
    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[row_col]),
                             pc.is_valid(b[col_col])))
        if b.num_rows == 0:
            return pa.table({"r": pa.array([], pa.string()),
                             "c": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = b.group_by([row_col, col_col]).aggregate(
            [(row_col, "count")])
        return pa.table({
            "r": pc.cast(g[row_col], pa.string()),
            "c": pc.cast(g[col_col], pa.string()),
            "n": pc.cast(g[f"{row_col}_count"], pa.int64())})

    parts = (ds.select_columns([row_col, col_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    cols = [row_col, col_col, "n", "row_n", "col_n", "total"]
    if not len(parts):
        return pd.DataFrame({row_col: pd.Series(dtype=object),
                             col_col: pd.Series(dtype=object),
                             **{c: pd.Series(dtype="int64")
                                for c in cols[2:]}})
    cells = (parts.groupby(["r", "c"], as_index=False)["n"].sum())
    cells["row_n"] = cells.groupby("r")["n"].transform("sum")
    cells["col_n"] = cells.groupby("c")["n"].transform("sum")
    cells["total"] = cells.n.sum()
    out = cells.rename(columns={"r": row_col, "c": col_col})
    return (out[cols].astype({c: "int64" for c in cols[2:]})
            .sort_values([row_col, col_col]).reset_index(drop=True))


def runs_test_counts(events_ds, ts_col: str = "ts") -> pd.DataFrame:
    """Wald–Wolfowitz RUNS-test integer surface over the DAILY event
    series — the randomness audit that catches batch-loaded or
    synthetic event streams (too few runs = clumped, too many =
    alternating): daily counts, their exact lower median, each day
    classified ``high`` (count ≥ median) or low, and the number of
    RUNS (maximal same-class stretches in day order).  Returns one
    row: ``(n_days, n_high, n_low, n_runs)``.  Null ts rows drop.

    Scale shape: per-batch (day, count) partials (days-sized driver
    merge); median + run count are day-vector arithmetic.
    """
    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[ts_col]))
        if b.num_rows == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        day = ts // 86_400_000_000
        ud, cnt = np.unique(day, return_counts=True)
        return pa.table({"day": pa.array(ud),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = (events_ds.select_columns([ts_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    if not len(parts):
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             ("n_days", "n_high", "n_low", "n_runs")})
    daily = (parts.groupby("day", as_index=False)["n"].sum()
             .sort_values("day"))
    counts = daily.n.to_numpy(np.int64)
    med = int(np.sort(counts)[(len(counts) - 1) // 2])  # lower median
    high = counts >= med
    runs = 1 + int((high[1:] != high[:-1]).sum()) if len(high) else 0
    return pd.DataFrame([{
        "n_days": len(counts), "n_high": int(high.sum()),
        "n_low": int((~high).sum()), "n_runs": runs}]).astype("int64")


def _avg_rank_x2(v: np.ndarray) -> np.ndarray:
    """2 × average (fractional) rank, 1-based, as exact int64 — ties
    share the mean of their positions, so doubling keeps integers:
    a tie-run occupying sorted positions [s, e] (0-based) gets
    ``s + e + 2``.  Matches SQL ``2*RANK() + COUNT(*) OVER
    (PARTITION BY value) - 1``."""
    order = np.argsort(v, kind="stable")
    sv = v[order]
    starts = np.flatnonzero(np.r_[True, sv[1:] != sv[:-1]])
    lens = np.diff(np.r_[starts, len(sv)])
    r2_sorted = np.repeat(starts + (starts + lens - 1) + 2, lens)
    r2 = np.empty(len(v), dtype=np.int64)
    r2[order] = r2_sorted
    return r2


def spearman_surface(ds, group_col: str, x_col: str, y_col: str,
                     num_buckets: int = 32,
                     max_bucket_rows: int | None = None) -> pd.DataFrame:
    """Per-group SPEARMAN rank-correlation integer surface — the
    monotone-association audit between two columns (e.g. does price
    track quantity within each return flag; does doc length track
    token count per language) with zero float policy: per group emit
    ``n`` and ``sum_d2_x4`` = Σ(2·avgrank(x) − 2·avgrank(y))², both
    exact BIGINT (average ranks are half-integers, so the doubled
    difference is integral; ρ ≈ 1 − 6·(sum_d2_x4/4)/(n(n²−1)) for the
    consumer, tie-corrected variants derivable from the same ranks).
    Rows with a null in ``group/x/y`` drop.

    Scale shape: ranking is per-group, so rows take ONE group-keyed
    hash exchange; each group must fit a merge task (the
    grouped-exchange contract — size ``num_buckets`` with the data,
    ``max_bucket_rows`` is the skew tripwire).  d² sums fit int64 up
    to n ≈ 1.3e6 rows per group (4n³ bound); larger groups need the
    sketch path, not this exact surface.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b[group_col]),
                            pc.is_valid(b[x_col])),
                    pc.is_valid(b[y_col]))
        b = b.filter(m)
        g = pc.cast(b[group_col], pa.string())
        h = md5_u64le(g)
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "g": g,
            "x": pc.cast(b[x_col], pa.float64()),
            "y": pc.cast(b[y_col], pa.float64())})

    def resolve(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False).astype(object)
        x = t.column("x").to_numpy(zero_copy_only=False)
        y = t.column("y").to_numpy(zero_copy_only=False)
        ug, inv = np.unique(g, return_inverse=True)
        ns, d2s = [], []
        for gi in range(len(ug)):
            sel = inv == gi
            d = _avg_rank_x2(x[sel]) - _avg_rank_x2(y[sel])
            ns.append(int(sel.sum()))
            d2s.append(int((d * d).sum()))
        return pa.table({"grp": pa.array(ug, type=pa.string()),
                         "n": pa.array(ns, type=pa.int64()),
                         "sum_d2_x4": pa.array(d2s, type=pa.int64())})

    tagged = (ds.select_columns([group_col, x_col, y_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve,
                           max_bucket_rows=max_bucket_rows)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"grp": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64"),
                             "sum_d2_x4": pd.Series(dtype="int64")})
    return (res.to_pandas().sort_values("grp").reset_index(drop=True))


def kendall_trend(events_ds, key_col: str = "user_id",
                  order_col: str = "ts", value_col: str = "value",
                  num_buckets: int = 32,
                  max_group_rows: int = 8192) -> pd.DataFrame:
    """Per-key KENDALL concordance surface over a time series — the
    per-user monotone-trend audit (is this user's ``value`` drifting
    up, down, or noise): for every pair of that key's events with
    STRICTLY increasing ``order_col`` (equal-timestamp pairs are
    order-ambiguous and excluded), count ``concordant`` (later value
    greater), ``discordant`` (later value smaller) and ``tie_value``
    (equal values).  Exact integers; τ-a ≈ (C−D)/(C+D+T) for the
    consumer.  Rows with a null key/order/value drop.  Returns
    ``(user_id, n, concordant, discordant, tie_value)`` by key.

    Scale shape: ONE key-hashed exchange co-locates each key's rows;
    pair counting is per-key O(n²) vectorized in row-chunks (bounded
    memory), with ``max_group_rows`` as the documented per-task bound
    — a key beyond it raises with guidance (pre-aggregate to daily
    values, or sample the key's events) rather than silently burning
    a merge task.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                            pc.is_valid(b[order_col])),
                    pc.is_valid(b[value_col]))
        b = b.filter(m)
        k = pc.cast(b[key_col], pa.int64())
        h = md5_u64le(pc.cast(k, pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "k": k,
            "o": pc.cast(pc.cast(b[order_col], pa.timestamp("us")),
                         pa.int64()),
            "v": pc.cast(b[value_col], pa.float64())})

    def resolve(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        o = t.column("o").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        uk = np.unique(k)
        rows = []
        for key in uk:
            sel = k == key
            n = int(sel.sum())
            if n > max_group_rows:
                raise ValueError(
                    f"kendall_trend: key {key} has {n} rows > "
                    f"max_group_rows={max_group_rows}; pre-aggregate "
                    "the series (e.g. daily values) or raise the bound")
            ok, vk = o[sel], v[sel]
            idx = np.argsort(ok, kind="stable")
            ok, vk = ok[idx], vk[idx]
            c = d = tv = 0
            chunk = 512
            for i0 in range(0, n, chunk):
                i1 = min(i0 + chunk, n)
                # pairs (i in [i0,i1), j > i) with o[j] > o[i]
                om = ok[None, i0:i1] < ok[i0:, None]      # (n-i0, i1-i0)
                tri = np.arange(i0, n)[:, None] > np.arange(i0, i1)[None, :]
                om &= tri
                dv = vk[i0:, None] - vk[None, i0:i1]
                c += int((om & (dv > 0)).sum())
                d += int((om & (dv < 0)).sum())
                tv += int((om & (dv == 0)).sum())
            rows.append((int(key), n, c, d, tv))
        cols = list(zip(*rows)) if rows else [[]] * 5
        return pa.table({
            "user_id": pa.array(cols[0], type=pa.int64()),
            "n": pa.array(cols[1], type=pa.int64()),
            "concordant": pa.array(cols[2], type=pa.int64()),
            "discordant": pa.array(cols[3], type=pa.int64()),
            "tie_value": pa.array(cols[4], type=pa.int64())})

    tagged = (events_ds.select_columns([key_col, order_col, value_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    out_cols = ("user_id", "n", "concordant", "discordant", "tie_value")
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in out_cols})
    return (res.to_pandas().sort_values("user_id")
            .reset_index(drop=True))


def theil_sen_daily(events_ds, ts_col: str = "ts") -> pd.DataFrame:
    """THEIL–SEN robust trend of the daily event volume — the
    outlier-immune "is traffic growing?" estimator (median of all
    pairwise day-over-day slopes, breakdown point 29%) with an exact
    integer surface: slopes are floored permille
    ``slope = ⌊1000·(c_j − c_i) / (d_j − d_i)⌋`` over all day pairs
    i < j, and the reported value is their exact lower median (the
    ``quantile_disc`` element).  Null ts rows drop.  Returns one row
    ``(n_days, n_pairs, median_slope_permille)``.

    Scale shape: daily counts are per-batch (day, count) partials with
    a days-sized driver merge (same as ``runs_test_counts``); the
    O(days²) pair enumeration is over the AGGREGATED day vector —
    3 years of days is ~600k pairs of int64 arithmetic, driver-cheap
    at any corpus size.
    """
    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[ts_col]))
        if b.num_rows == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        ud, cnt = np.unique(ts // 86_400_000_000, return_counts=True)
        return pa.table({"day": pa.array(ud),
                         "n": pa.array(cnt.astype(np.int64))})

    parts = (events_ds.select_columns([ts_col])
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    cols = ("n_days", "n_pairs", "median_slope_permille")
    if not len(parts):
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    daily = (parts.groupby("day", as_index=False)["n"].sum()
             .sort_values("day"))
    d = daily.day.to_numpy(np.int64)
    c = daily.n.to_numpy(np.int64)
    i, j = np.triu_indices(len(d), k=1)
    if not len(i):
        return pd.DataFrame([{"n_days": len(d), "n_pairs": 0,
                              "median_slope_permille": 0}]
                            ).astype("int64")
    slopes = np.sort((1000 * (c[j] - c[i])) // (d[j] - d[i]))
    med = int(slopes[(len(slopes) - 1) // 2])  # lower median
    return pd.DataFrame([{
        "n_days": len(d), "n_pairs": len(slopes),
        "median_slope_permille": med}]).astype("int64")


def ab_uplift_counts(events_ds, user_col: str = "user_id",
                     type_col: str = "event_type") -> pd.DataFrame:
    """A/B-cohort UPLIFT integer surface — the experiment-analysis
    primitive over an md5 user split (variant = md5-bucket parity of
    the user key, the engine's hash contract, so assignment is stable
    across runs/engines and consistent with ``split_assign``): per
    event type, events and DISTINCT users in each variant —
    conversion-rate uplift derives exactly from the counts (the
    conversion type's ``users_a/users_b`` ARE the converting-user
    counts).  Null user/type rows drop.  Returns per type
    ``(event_type, n_a, n_b, users_a, users_b)``.

    Scale shape: per-batch (type, variant, user) distinct partials;
    ONE user-free merge for event counts (types-sized) and ONE
    user-keyed distinct-count exchange reusing the map-side dedup
    idiom — nothing user-cardinality-sized lands on the driver except
    the final per-type counts.
    """
    from ..pipelines.sample import _hash_buckets
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    num_buckets = 32

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[user_col]),
                             pc.is_valid(b[type_col])))
        empty = pa.table({"__b": pa.array([], pa.int64()),
                          "et": pa.array([], pa.string()),
                          "u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if b.num_rows == 0:
            return empty
        u = pc.cast(b[user_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        et = pc.cast(b[type_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        v = _hash_buckets(pc.cast(pa.array(u), pa.string())) % 2
        df = (pd.DataFrame({"et": et, "u": u, "v": v})
              .groupby(["et", "u", "v"], as_index=False).size())
        h = md5_u64le(pc.cast(pa.array(df.u.to_numpy(np.int64)),
                              pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "et": pa.array(df.et.to_numpy(), pa.string()),
            "u": pa.array(df.u.to_numpy(np.int64)),
            "v": pa.array(df.v.to_numpy(np.int64)),
            "n": pa.array(df["size"].to_numpy(np.int64))})

    def resolve(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "et": t.column("et").to_numpy(zero_copy_only=False),
            "u": t.column("u").to_numpy(zero_copy_only=False),
            "v": t.column("v").to_numpy(zero_copy_only=False),
            "n": t.column("n").to_numpy(zero_copy_only=False)})
        per_user = df.groupby(["et", "u", "v"], as_index=False)["n"].sum()
        out = (per_user.groupby(["et", "v"], as_index=False)
               .agg(n=("n", "sum"), users=("u", "nunique")))
        return pa.table({
            "et": pa.array(out.et.to_numpy(object), pa.string()),
            "v": pa.array(out.v.to_numpy(np.int64)),
            "n": pa.array(out.n.to_numpy(np.int64)),
            "users": pa.array(out.users.to_numpy(np.int64))})

    tagged = (events_ds.select_columns([user_col, type_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    cols = ("event_type", "n_a", "n_b", "users_a", "users_b")
    if res is None or res.num_rows == 0:
        return pd.DataFrame({
            "event_type": pd.Series(dtype=object),
            **{c: pd.Series(dtype="int64") for c in cols[1:]}})
    df = res.to_pandas().groupby(["et", "v"], as_index=False).sum()
    wide = df.pivot_table(index="et", columns="v",
                          values=["n", "users"], fill_value=0,
                          aggfunc="sum")
    out = pd.DataFrame({
        "event_type": wide.index,
        "n_a": wide.get(("n", 0), pd.Series(0, index=wide.index)),
        "n_b": wide.get(("n", 1), pd.Series(0, index=wide.index)),
        "users_a": wide.get(("users", 0),
                            pd.Series(0, index=wide.index)),
        "users_b": wide.get(("users", 1),
                            pd.Series(0, index=wide.index))})
    return (out.sort_values("event_type").reset_index(drop=True)
            .astype({c: "int64" for c in cols[1:]}))


def grouped_weighted_median(ds, group_col: str, value_col: str,
                            weight_col: str,
                            batch_size: int = 65536) -> pd.DataFrame:
    """EXACT per-group WEIGHTED lower median — the quantity-weighted
    price/center question (``grouped_exact_quantiles`` weights every
    row 1; here a row with weight w counts w times): the reported
    value is the smallest group value whose cumulative weight reaches
    ``ceil(W/2)`` (lower weighted median, a member of the data).
    Weights must be non-negative integers; rows with null
    value/weight or zero weight drop (the group, as ever, may be
    null).  Returns ``(group, n, total_w, wmedian)``.

    Scale shape: identical to ``grouped_exact_quantiles`` — per-batch
    (group, value, Σweight) partials bound wire data by
    groups × distinct values, then a cardinality-guarded merge and a
    per-group cumulative-weight scan.
    """
    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, value_col, weight_col])
        t = t.filter(pc.and_(pc.is_valid(t[value_col]),
                             pc.is_valid(t[weight_col])))
        t = t.filter(pc.greater(t[weight_col], 0))
        g = (t.group_by([group_col, value_col])
             .aggregate([(weight_col, "sum"), ([], "count_all")]))
        return g.rename_columns([group_col, value_col, "w", "cnt"])

    parts = (ds.select_columns([group_col, value_col, weight_col])
             .map_batches(partial, batch_format="pyarrow",
                          batch_size=batch_size).materialize())
    g = _merge_partials(parts, [group_col, value_col],
                        {"w": "sum", "cnt": "sum"}, keep_null_keys=True)
    if not len(g):
        return pd.DataFrame({group_col: [], "n": [], "total_w": [],
                             "wmedian": []})
    g = g.sort_values([group_col, value_col], kind="stable",
                      na_position="first").reset_index(drop=True)
    rows = []
    for grp, sub in g.groupby(group_col, dropna=False, sort=False):
        w = sub["w"].to_numpy(np.int64)
        cum = np.cumsum(w)
        W = int(cum[-1])
        thr = (W + 1) // 2  # ceil(W/2): lower weighted median
        med = sub[value_col].to_numpy()[np.searchsorted(cum, thr)]
        rows.append({group_col: grp, "n": int(sub["cnt"].sum()),
                     "total_w": W, "wmedian": med})
    out = pd.DataFrame(rows)
    return (out.sort_values(group_col, na_position="first")
            .reset_index(drop=True)
            .astype({"n": "int64", "total_w": "int64"}))


def _key_count_histogram(rows_ds, key_col: str,
                         num_buckets: int = 32):
    """Per-key occurrence counts reduced to a COUNT HISTOGRAM
    ``(count value → #keys with that count)``, returned as two int64
    arrays ``(counts_desc, n_keys)`` — the scale shape shared by
    :func:`pareto_coverage` and :func:`rank_decile_mass`: a key-hashed
    exchange emits per-bucket histograms, so the driver sees only
    distinct count values, never a keys-sized frame.  Null keys drop.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[key_col]))
        k = pc.cast(b[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        uk, cnt = np.unique(k, return_counts=True)
        h = md5_u64le(pc.cast(pa.array(uk), pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "k": pa.array(uk), "c": pa.array(cnt.astype(np.int64))})

    def resolve(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        per_key = np.zeros(len(uk), dtype=np.int64)
        np.add.at(per_key, inv, c)
        cnts, n_keys = np.unique(per_key, return_counts=True)
        return pa.table({"cnt": pa.array(cnts),
                         "n_keys": pa.array(n_keys.astype(np.int64))})

    tagged = (rows_ds.select_columns([key_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    if res is None or res.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    hist = (res.to_pandas().groupby("cnt", as_index=False)
            ["n_keys"].sum().sort_values("cnt", ascending=False))
    return (hist.cnt.to_numpy(np.int64),
            hist.n_keys.to_numpy(np.int64))


def rank_decile_mass(rows_ds, key_col: str = "token",
                     num_buckets: int = 32) -> pd.DataFrame:
    """ZIPF rank-decile mass — how corpus occurrences distribute over
    frequency-rank deciles (the long-tail profile behind vocabulary
    truncation and sampling-temperature choices): keys ranked 1..V by
    count descending, decile of rank r is ``(10·(r−1)) // V``, and
    each decile reports its key count, its summed occurrences, and
    that mass in permille of the corpus.  Tie order among equal
    counts cannot change any decile's mass (every key of a count-run
    contributes the same count wherever the run straddles a
    boundary).  Null keys drop.  Returns up to 10 rows
    ``(decile, n_keys, mass, mass_pm)`` ordered by decile.

    Scale shape: the same count-histogram exchange as
    :func:`pareto_coverage` (`_key_count_histogram`); the driver walks
    only distinct count values.
    """
    cv, nk = _key_count_histogram(rows_ds, key_col, num_buckets)
    cols = ("decile", "n_keys", "mass", "mass_pm")
    if not len(cv):
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    V = int(nk.sum())
    total = int((cv * nk).sum())
    cum_keys = np.cumsum(nk)
    cum_events = np.cumsum(cv * nk)

    def events_top(r: int) -> int:
        # occurrences of the top-r ranks (any tie order)
        if r <= 0:
            return 0
        i = int(np.searchsorted(cum_keys, r))
        before_e = int(cum_events[i - 1]) if i else 0
        before_k = int(cum_keys[i - 1]) if i else 0
        return before_e + (r - before_k) * int(cv[i])

    rows = []
    for d in range(10):
        lo = (d * V + 9) // 10 + 1          # first rank of decile d
        hi = ((d + 1) * V + 9) // 10        # last rank of decile d
        if hi < lo:
            continue  # V < 10: some deciles hold no rank
        mass = events_top(hi) - events_top(lo - 1)
        rows.append({"decile": d, "n_keys": hi - lo + 1,
                     "mass": mass,
                     "mass_pm": 1000 * mass // total})
    return pd.DataFrame(rows).astype("int64")


def pareto_coverage(events_ds, key_col: str = "user_id",
                    permille: int = 800,
                    num_buckets: int = 32) -> pd.DataFrame:
    """PARETO concentration of activity — "how few keys produce 80%
    of the events?" (the skew headline behind hot-key planning and
    the 80/20 sanity check): the minimal number of keys whose summed
    event counts reach ``ceil(permille/1000 · total)``, filling
    greedily from the most active key down (tie order among equal
    counts cannot change the answer).  Null keys drop.  Returns one
    row ``(n_keys, n_events, threshold, k_min)``.

    Scale shape: per-key counts reduce through a key-hashed exchange
    to a COUNT HISTOGRAM (count value → #keys with that count) per
    bucket — the driver sees only merged histogram rows (distinct
    count values), never a keys-sized frame; the greedy scan walks
    the histogram descending.
    """
    cv, nk = _key_count_histogram(events_ds, key_col, num_buckets)
    cols = ("n_keys", "n_events", "threshold", "k_min")
    if not len(cv):
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    total = int((cv * nk).sum())
    thr = -(-permille * total // 1000)  # ceil
    cum_events = np.cumsum(cv * nk)
    cum_keys = np.cumsum(nk)
    i = int(np.searchsorted(cum_events, thr))
    # inside run i, each key adds cv[i]; keys needed from this run:
    before_e = int(cum_events[i - 1]) if i else 0
    before_k = int(cum_keys[i - 1]) if i else 0
    need = -(-(thr - before_e) // int(cv[i]))  # ceil
    return pd.DataFrame([{
        "n_keys": int(nk.sum()), "n_events": total,
        "threshold": thr, "k_min": before_k + need}]).astype("int64")


def global_gap_windows(events_ds, ts_col: str = "ts",
                       min_gap_us: int = 1_800_000_000) -> pd.DataFrame:
    """GLOBAL outage detection — gaps ≥ ``min_gap_us`` in the merged
    event stream (the ingestion-SLA audit: a silent collector shows up
    as a hole in the global timeline, invisible to per-user gap
    audits): returns every maximal silent window as
    ``(gap_start_us, gap_end_us, gap_us)`` — the last event before
    and first event after the hole — ordered by start.  Null ts drop.

    Scale shape: NO global sort.  Events bucket by epoch-day; each
    within-day gap is local to one day's rows (distinct ts per day is
    bounded), and cross-day gaps derive from the per-day
    (min, max, n) summary — a days-sized driver vector that also
    yields whole-empty-day outages exactly.
    """
    from ..stages.exchange import grouped_exchange

    DAY = 86_400_000_000
    num_buckets = 32

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[ts_col]))
        ts = np.unique(pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                               pa.int64()).to_numpy(zero_copy_only=False))
        d = ts // DAY
        return pa.table({"__b": pa.array((d % num_buckets)
                                         .astype(np.int64)),
                         "d": pa.array(d), "t": pa.array(ts)})

    def resolve(t: pa.Table) -> pa.Table:
        d = t.column("d").to_numpy(zero_copy_only=False)
        ts = np.unique(t.column("t").to_numpy(zero_copy_only=False))
        d = ts // DAY
        # within-day gaps (adjacent in the global order because a
        # day's timestamps are contiguous in sorted order)
        same_day = d[1:] == d[:-1]
        gap = ts[1:] - ts[:-1]
        sel = same_day & (gap >= min_gap_us)
        starts, ends = ts[:-1][sel], ts[1:][sel]
        # per-day summary for the cross-day stitching pass
        ud, first_idx = np.unique(d, return_index=True)
        last_idx = np.r_[first_idx[1:], len(ts)] - 1
        return pa.table({
            "kind": pa.array(np.r_[np.zeros(len(starts), np.int64),
                                   np.ones(len(ud), np.int64)]),
            "a": pa.array(np.r_[starts, ts[first_idx]]),
            "b": pa.array(np.r_[ends, ts[last_idx]]),
            "d": pa.array(np.r_[np.full(len(starts), -1, np.int64),
                                ud])})

    tagged = (events_ds.select_columns([ts_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    cols = ("gap_start_us", "gap_end_us", "gap_us")
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    df = res.to_pandas()
    gaps = df[df.kind == 0][["a", "b"]]
    days = df[df.kind == 1].sort_values("d")
    # cross-day gaps: last ts of each day -> first ts of the next
    # non-empty day (whole empty days in between are part of the hole)
    a = days.b.to_numpy(np.int64)[:-1]
    b = days.a.to_numpy(np.int64)[1:]
    sel = (b - a) >= min_gap_us
    out = pd.DataFrame({
        "gap_start_us": np.r_[gaps.a.to_numpy(np.int64), a[sel]],
        "gap_end_us": np.r_[gaps.b.to_numpy(np.int64), b[sel]]})
    out["gap_us"] = out.gap_end_us - out.gap_start_us
    return (out.sort_values("gap_start_us").reset_index(drop=True)
            .astype("int64"))


def l_diversity(ds, qi_cols: list[str], sensitive_col: str,
                max_distinct: int, num_buckets: int = 32,
                max_bucket_rows: int | None = None) -> pd.DataFrame:
    """ℓ-diversity audit: quasi-identifier classes whose SENSITIVE
    attribute takes fewer than ``max_distinct`` distinct values — the
    attribute-disclosure companion to the k-anonymity row-count check
    (a class can satisfy k yet leak if every member shares one
    sensitive value).  Returns ``(*qi_cols, n_distinct)`` for classes
    with ``n_distinct < max_distinct``, sorted by the QI columns.
    Rows with a null QI or null sensitive value drop (SQL ``COUNT
    (DISTINCT ...)`` + WHERE semantics).

    Scale shape: each block first collapses to its DISTINCT
    (qi..., sensitive) combos (pyarrow group_by — repeats never leave
    the block), survivors route through ONE class-keyed hash exchange
    (a class's combos land in one bucket, so the per-bucket distinct
    count is globally exact), and only class-cardinality-sized rows
    reach the driver.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    cols = list(qi_cols) + [sensitive_col]

    def partial(b: pa.Table) -> pa.Table:
        m = pc.is_valid(b[cols[0]])
        for c in cols[1:]:
            m = pc.and_(m, pc.is_valid(b[c]))
        b = b.select(cols).filter(m)
        b = b.group_by(cols).aggregate([])  # block-local distinct
        key = pc.cast(b[qi_cols[0]], pa.string())
        for c in qi_cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(b[c], pa.string()), "\x1f")
        h = md5_u64le(key)
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def resolve(t: pa.Table) -> pa.Table:
        d = t.group_by(cols).aggregate([])  # cross-block dedup
        counts = d.group_by(list(qi_cols)).aggregate(
            [(sensitive_col, "count")])
        return counts.rename_columns(list(qi_cols) + ["n_distinct"])

    tagged = ds.map_batches(partial, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve,
                           max_bucket_rows=max_bucket_rows)
    if res is None or res.num_rows == 0:
        return pd.DataFrame(columns=list(qi_cols) + ["n_distinct"])
    df = res.to_pandas()
    df = df[df["n_distinct"] < max_distinct]
    return (df.sort_values(list(qi_cols)).reset_index(drop=True)
            .astype({"n_distinct": "int64"}))


def t_closeness_surface(ds, qi_col: str, sensitive_col: str) -> pd.DataFrame:
    """t-closeness integer surface: per quasi-identifier class, the
    CROSS-MULTIPLIED L1 distance between the class's sensitive-value
    distribution and the corpus-global one —
    ``l1_x = Σ_v |c_qv·N − C_v·n_q|`` (c_qv = count of value v in
    class q, C_v global count, n_q class size, N total), an exact
    BIGINT whose normalized form ``l1_x / (2·n_q·N)`` is the usual
    total-variation t (float division left to the consumer).  Values
    ABSENT from a class still contribute ``C_v·n_q`` — the class is
    maximally far from mass it has none of.  Rows with a null QI or
    sensitive value drop.  Returns ``(qi, n, l1_x)`` sorted by qi.

    Scale shape: one pass of per-batch (qi, v) partial counts merged
    by the cardinality-guarded ``grouped_stats`` path; the driver
    finishes on an alphabet²-sized frame (classes × values), never
    row-sized.  Both alphabets must be small (privacy QI/sensitive
    columns are categorical by construction); high-cardinality
    sensitive columns should be bucketed by the caller first.
    """
    def add_one(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[qi_col]), pc.is_valid(b[sensitive_col]))
        b = b.select([qi_col, sensitive_col]).filter(m)
        return b.append_column(
            "__one", pa.array(np.ones(b.num_rows, dtype=np.int64)))

    counts = grouped_stats(
        ds.map_batches(add_one, batch_format="pyarrow"),
        [qi_col, sensitive_col], {"__one": ["sum"]}).rename(
            columns={"__one_sum": "c"})
    if counts.empty:
        return pd.DataFrame({"qi": pd.Series(dtype=object),
                             "n": pd.Series(dtype="int64"),
                             "l1_x": pd.Series(dtype="int64")})
    # densify: every class × every observed value (absent -> 0)
    pivot = counts.pivot_table(index=qi_col, columns=sensitive_col,
                               values="c", fill_value=0, aggfunc="sum")
    mat = pivot.to_numpy().astype(np.int64)      # classes × values
    n_q = mat.sum(axis=1)                        # class sizes
    c_v = mat.sum(axis=0)                        # global value counts
    total = int(mat.sum())
    l1 = np.abs(mat * total - np.outer(n_q, c_v)).sum(axis=1)
    out = pd.DataFrame({"qi": pivot.index.to_numpy(),
                        "n": n_q, "l1_x": l1})
    return (out.sort_values("qi").reset_index(drop=True)
            .astype({"n": "int64", "l1_x": "int64"}))


def mannwhitney_surface(ds, group_col: str, value_col: str,
                        side_col: str, num_buckets: int = 32,
                        max_bucket_rows: int | None = None
                        ) -> pd.DataFrame:
    """Per-group MANN-WHITNEY U integer surface — the two-sample
    location test (did treatment docs get longer; is source A's
    quality shifted vs B) with zero float policy: within each group,
    rank the COMBINED sample (doubled average ranks stay integral
    under ties, same contract as :func:`spearman_surface`) and emit
    ``u0_x2 = Σ_{side=0} 2·avgrank − n0·(n0+1)`` — exactly 2·U for
    side 0; U₁ = n0·n1 − U₀ and the normal approximation derive on
    the consumer side.  ``side_col`` must be an integer 0/1 column
    the caller computed (md5-parity split, A/B variant, epoch).
    Rows with null group/value/side drop.  Returns
    ``(grp, n0, n1, u0_x2)`` sorted by grp.

    Scale shape: ONE group-keyed hash exchange; ranking is per-group
    vectorized (no per-row Python), d²-style int64 bounds hold to
    ~10⁹ rows per group.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.is_valid(b[group_col]),
                            pc.is_valid(b[value_col])),
                    pc.is_valid(b[side_col]))
        b = b.filter(m)
        g = pc.cast(b[group_col], pa.string())
        h = md5_u64le(g)
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "g": g,
            "v": pc.cast(b[value_col], pa.float64()),
            "s": pc.cast(b[side_col], pa.int64())})

    def resolve(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False).astype(object)
        v = t.column("v").to_numpy(zero_copy_only=False)
        s = t.column("s").to_numpy(zero_copy_only=False)
        ug, inv = np.unique(g, return_inverse=True)
        n0s, n1s, us = [], [], []
        for gi in range(len(ug)):
            sel = inv == gi
            r2 = _avg_rank_x2(v[sel])
            side = s[sel]
            n0 = int((side == 0).sum())
            n1 = int(sel.sum()) - n0
            u0x2 = int(r2[side == 0].sum()) - n0 * (n0 + 1)
            n0s.append(n0); n1s.append(n1); us.append(u0x2)
        return pa.table({"grp": pa.array(ug, type=pa.string()),
                         "n0": pa.array(n0s, type=pa.int64()),
                         "n1": pa.array(n1s, type=pa.int64()),
                         "u0_x2": pa.array(us, type=pa.int64())})

    tagged = (ds.select_columns([group_col, value_col, side_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve,
                           max_bucket_rows=max_bucket_rows)
    if res is None or res.num_rows == 0:
        return pd.DataFrame({"grp": pd.Series(dtype=object),
                             "n0": pd.Series(dtype="int64"),
                             "n1": pd.Series(dtype="int64"),
                             "u0_x2": pd.Series(dtype="int64")})
    return res.to_pandas().sort_values("grp").reset_index(drop=True)


def gap_moments(events_ds, key_col: str = "user_id",
                ts_col: str = "ts", id_col: str = "event_id",
                num_buckets: int = 32,
                max_bucket_rows: int | None = None) -> pd.DataFrame:
    """Per-key INTER-ARRIVAL moment surface — the burstiness audit
    (a user whose variance dwarfs the squared mean is bursty; a
    bot-like metronome has variance ≈ 0) with zero float policy: for
    each key with ≥ 2 events, ``n_gaps``, ``sum_gap_s`` and
    ``sum_gap2_s`` over consecutive gaps ordered by (ts, id-tiebreak),
    each gap floored to whole seconds (``gap_us // 1_000_000`` —
    seconds keep the squared sum inside int64: a century is ~3·10⁹ s,
    squared 10¹⁹ would overflow, but real inter-event gaps are ≤
    years ~3·10⁷ s → 10¹⁵ per term).  CV² = n·Σg²/(Σg)² − 1 and the
    Fano factor derive on the consumer side.  Keys with one event
    emit nothing; null key/ts rows drop.

    Scale shape: ONE key-hashed exchange; per-bucket one lexsort +
    shifted diff (no per-key loop) + np.add.at per-key sums — output
    is key-cardinality, computed entirely in the merge tasks.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(b[key_col]), pc.is_valid(b[ts_col]))
        b = b.select([key_col, ts_col, id_col]).filter(keep)
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def resolve(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        iv = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        o = np.lexsort((iv, ts, k))
        ks, tss = k[o], ts[o]
        same = ks[1:] == ks[:-1]
        gap_s = (tss[1:] - tss[:-1])[same] // 1_000_000
        gk = ks[1:][same]
        u, inv = np.unique(gk, return_inverse=True)
        n = np.zeros(len(u), dtype=np.int64)
        s1 = np.zeros(len(u), dtype=np.int64)
        s2 = np.zeros(len(u), dtype=np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s1, inv, gap_s)
        np.add.at(s2, inv, gap_s * gap_s)
        return pa.table({key_col: pa.array(u),
                         "n_gaps": pa.array(n),
                         "sum_gap_s": pa.array(s1),
                         "sum_gap2_s": pa.array(s2)})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve,
                           max_bucket_rows=max_bucket_rows)
    cols = [key_col, "n_gaps", "sum_gap_s", "sum_gap2_s"]
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    return (res.to_pandas().sort_values(key_col)
            .reset_index(drop=True).astype("int64"))


def ks_surface(ds, group_col: str, value_col: str,
               group_a, group_b) -> pd.DataFrame:
    """Two-sample KOLMOGOROV-SMIRNOV integer surface between groups
    ``a`` and ``b`` — the distribution-shift gate (is source A's
    length distribution the same as B's) with zero float policy:
    ``d_x = max_v |cumA(v)·n_b − cumB(v)·n_a|`` over the union of
    observed values (cross-multiplied, so D = d_x/(n_a·n_b) derives
    on the consumer side) plus ``at_value``, the smallest value
    attaining the max (deterministic tie rule).  Rows outside the two
    groups or with null value drop.  Returns one row
    ``(n_a, n_b, d_x, at_value)``.

    Scale shape: per-batch partial counts collapse to (value, side)
    pairs (map-side combine through the cardinality-guarded
    ``grouped_stats`` merge), so the driver finishes on a
    distinct-value-sized frame — the documented contract: values must
    be discrete/bounded (lengths, counts, bucketed floats); bucket
    continuous columns first.
    """
    def partial(b: pa.Table) -> pa.Table:
        g = pc.cast(b[group_col], pa.string())
        m = pc.and_(pc.or_(pc.equal(g, str(group_a)),
                           pc.equal(g, str(group_b))),
                    pc.is_valid(b[value_col]))
        b2 = pa.table({"g": g, "v": b[value_col]}).filter(
            pc.fill_null(m, False))
        one = np.ones(b2.num_rows, dtype=np.int64)
        return b2.append_column("__one", pa.array(one))

    counts = grouped_stats(
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow"),
        ["g", "v"], {"__one": ["sum"]}).rename(
            columns={"__one_sum": "c"})
    cols = ("n_a", "n_b", "d_x", "at_value")
    if counts.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    piv = (counts.pivot_table(index="v", columns="g", values="c",
                              fill_value=0, aggfunc="sum")
           .reindex(columns=[str(group_a), str(group_b)], fill_value=0)
           .sort_index())
    ca = piv[str(group_a)].to_numpy(np.int64).cumsum()
    cb = piv[str(group_b)].to_numpy(np.int64).cumsum()
    n_a, n_b = int(ca[-1]), int(cb[-1])
    diff = np.abs(ca * n_b - cb * n_a)
    d_x = int(diff.max())
    at = piv.index.to_numpy()[int(np.argmax(diff))]  # first max
    return pd.DataFrame([{"n_a": n_a, "n_b": n_b, "d_x": d_x,
                          "at_value": int(at)}]).astype("int64")


def autocorr_surface(events_ds, key_col: str = "user_id",
                     ts_col: str = "ts", id_col: str = "event_id",
                     value_col: str = "value",
                     num_buckets: int = 32,
                     max_bucket_rows: int | None = None
                     ) -> pd.DataFrame:
    """Per-key LAG-1 AUTOCORRELATION integer surface — the
    memory-vs-noise audit of a key's value series (does a high value
    predict the next one): over consecutive pairs in (ts, id) order,
    exact int64 sums of the PERMILLE-floored values
    ``p = ⌊1000·v⌋`` — ``n_pairs, s_xy, s_head, s_tail, s_head2,
    s_tail2`` (head = earlier element of each pair, tail = later);
    Pearson r over pairs derives on the consumer side.  The permille
    floor is the engine-wide float escape hatch: both engines floor
    the SAME float64 product, so the lattice is identical
    (``CAST(floor(1000.0·v) AS BIGINT)`` in SQL — floor, not ``//``,
    for negative safety).  Keys with < 2 events emit nothing; null
    key/ts/value rows drop.  Returns one row per key sorted by key.

    Scale shape: ONE key-hashed exchange, per-bucket lexsort +
    shifted compare (no per-key loop), np.add.at partial sums.
    int64 bound: |p| ≤ 10⁶-ish values square to 10¹²; 10⁶ pairs per
    key stay inside int64.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                               pc.is_valid(b[ts_col])),
                       pc.is_valid(b[value_col]))
        b = b.select([key_col, ts_col, id_col, value_col]).filter(keep)
        h = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)))

    def resolve(t: pa.Table) -> pa.Table:
        k = pc.cast(t[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        iv = pc.cast(t[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        v = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        p = np.floor(1000.0 * v).astype(np.int64)
        o = np.lexsort((iv, ts, k))
        ks, ps = k[o], p[o]
        same = ks[1:] == ks[:-1]
        head, tail, gk = ps[:-1][same], ps[1:][same], ks[1:][same]
        u, inv = np.unique(gk, return_inverse=True)
        sums = {}
        for name, arr in (("n_pairs", np.ones(len(gk), np.int64)),
                          ("s_xy", head * tail),
                          ("s_head", head), ("s_tail", tail),
                          ("s_head2", head * head),
                          ("s_tail2", tail * tail)):
            acc = np.zeros(len(u), dtype=np.int64)
            np.add.at(acc, inv, arr)
            sums[name] = acc
        return pa.table({key_col: pa.array(u),
                         **{n: pa.array(a) for n, a in sums.items()}})

    tagged = events_ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, resolve,
                           max_bucket_rows=max_bucket_rows)
    cols = [key_col, "n_pairs", "s_xy", "s_head", "s_tail",
            "s_head2", "s_tail2"]
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    return (res.to_pandas()[cols].sort_values(key_col)
            .reset_index(drop=True).astype("int64"))


def lorenz_points(events_ds, key_col: str = "user_id",
                  deciles: int = 10,
                  num_buckets: int = 32) -> pd.DataFrame:
    """LORENZ-CURVE grid of activity concentration — the inequality
    companion to :func:`pareto_coverage` (one curve instead of one
    scalar): keys sorted by ascending event count; at each decile
    boundary ``i_d = ⌊d·n_keys/10⌋`` report the cumulative events of
    the i_d least-active keys.  Sums over the smallest-i counts are
    tie-order-invariant, so the grid is deterministic without a key
    tiebreak.  Returns ``(decile, cum_users, cum_events)`` for
    d = 1..deciles.

    Scale shape: identical to pareto_coverage — per-key counts reduce
    through a key-hashed exchange to a COUNT HISTOGRAM (count value →
    #keys); the driver walks distinct-count-sized rows, never a
    keys-sized frame.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[key_col]))
        k = pc.cast(b[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        uk, cnt = np.unique(k, return_counts=True)
        h = md5_u64le(pc.cast(pa.array(uk), pa.string()))
        return pa.table({
            "__b": pa.array((h % np.uint64(num_buckets))
                            .astype(np.int64)),
            "k": pa.array(uk), "c": pa.array(cnt.astype(np.int64))})

    def resolve(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        uk, inv = np.unique(k, return_inverse=True)
        per_key = np.zeros(len(uk), dtype=np.int64)
        np.add.at(per_key, inv, c)
        cnts, n_keys = np.unique(per_key, return_counts=True)
        return pa.table({"cnt": pa.array(cnts),
                         "n_keys": pa.array(n_keys.astype(np.int64))})

    tagged = (events_ds.select_columns([key_col])
              .map_batches(partial, batch_format="pyarrow"))
    res = grouped_exchange(tagged, "__b", num_buckets, resolve)
    cols = ("decile", "cum_users", "cum_events")
    if res is None or res.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    hist = (res.to_pandas().groupby("cnt", as_index=False)
            ["n_keys"].sum().sort_values("cnt"))  # ascending counts
    cv = hist.cnt.to_numpy(np.int64)
    nk = hist.n_keys.to_numpy(np.int64)
    n = int(nk.sum())
    cum_keys = np.cumsum(nk)
    cum_events = np.cumsum(cv * nk)
    rows = []
    for d in range(1, deciles + 1):
        i_d = d * n // deciles
        if i_d == 0:
            rows.append((d, 0, 0))
            continue
        r = int(np.searchsorted(cum_keys, i_d))
        before_k = int(cum_keys[r - 1]) if r else 0
        before_e = int(cum_events[r - 1]) if r else 0
        rows.append((d, i_d, before_e + (i_d - before_k) * int(cv[r])))
    return pd.DataFrame(rows, columns=list(cols)).astype("int64")


def frequent_itemsets3(ds, group_col: str, item_col: str,
                       min_support: int = 2, max_basket: int = 64,
                       num_buckets: int = 32) -> pd.DataFrame:
    """Frequent item TRIPLES over transaction baskets — the k=3 layer
    of frequent-itemset mining (Agrawal & Srikant, VLDB'94 Apriori),
    mined directly: every unordered triple of distinct items that
    co-occurs in ``>= min_support`` baskets, with its support count.
    Complements ``heavy_hitters`` (k=1) and ``copurchase_rules``
    (k=2).  Returns (item_a, item_b, item_c, support) with
    a < b < c, sorted.  Null group/item rows drop.

    Baskets with more than ``max_basket`` DISTINCT items are excluded
    (documented contract, mirrored by the oracle): per-basket
    candidate count is C(sz,3), so one degenerate mega-basket would
    dominate the run while carrying no association signal — standard
    practice in basket mining.

    Scale shape: blocks collapse to distinct (basket, item) pairs
    map-side (one lexsort); a basket-keyed hash exchange co-locates
    each basket's items; merge tasks enumerate triples VECTORIZED per
    basket-size class (one precomputed C(sz,3) fancy-index per
    distinct size — no per-basket Python loop) and pre-count locally,
    so only (triple, partial_count) rows enter the second,
    triple-keyed exchange whose merges sum counts and drop
    sub-threshold triples — the driver receives survivors only.
    """
    from itertools import combinations

    from ..stages.exchange import grouped_exchange, grouped_exchange_ds

    def pairs(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[item_col])))
        g = pc.cast(b[group_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        i = pc.cast(b[item_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((i, g))
        g, i = g[order], i[order]
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (g[1:] != g[:-1]) | (i[1:] != i[:-1])
        g, i = g[keep], i[keep]
        return pa.table({"__b": pa.array(g % num_buckets),
                         "g": pa.array(g), "i": pa.array(i)})

    def enum_triples(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False)
        i = t.column("i").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, g))
        g, i = g[order], i[order]
        # cross-block duplicate (basket, item) pairs
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (g[1:] != g[:-1]) | (i[1:] != i[:-1])
        g, i = g[keep], i[keep]
        new = np.ones(len(g), dtype=bool)
        new[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(g)))
        out_a, out_b, out_c = [], [], []
        for sz in np.unique(sizes):
            if sz < 3 or sz > max_basket:
                continue
            sel = starts[sizes == sz]
            # (n_baskets, sz) matrix of each basket's sorted items
            mat = i[(sel[:, None] + np.arange(sz)[None, :])]
            idx = np.array(list(combinations(range(sz), 3)))
            out_a.append(mat[:, idx[:, 0]].ravel())
            out_b.append(mat[:, idx[:, 1]].ravel())
            out_c.append(mat[:, idx[:, 2]].ravel())
        if not out_a:
            e = np.empty(0, np.int64)
            return pa.table({"__b": pa.array(e), "a": pa.array(e),
                             "b": pa.array(e), "c": pa.array(e),
                             "n": pa.array(e)})
        a = np.concatenate(out_a)
        b_ = np.concatenate(out_b)
        c = np.concatenate(out_c)
        # local pre-count: same triple from many baskets in this bucket
        order = np.lexsort((c, b_, a))
        a, b_, c = a[order], b_[order], c[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b_[1:] != b_[:-1]) \
            | (c[1:] != c[:-1])
        st = np.flatnonzero(new)
        n = np.diff(np.append(st, len(a))).astype(np.int64)
        a, b_, c = a[st], b_[st], c[st]
        bk = (a * 1_000_003 + b_ * 10_007 + c) % num_buckets
        return pa.table({"__b": pa.array(bk), "a": pa.array(a),
                         "b": pa.array(b_), "c": pa.array(c),
                         "n": pa.array(n)})

    def count_merge(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b_ = t.column("b").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((c, b_, a))
        a, b_, c, n = a[order], b_[order], c[order], n[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b_[1:] != b_[:-1]) \
            | (c[1:] != c[:-1])
        st = np.flatnonzero(new)
        tot = np.add.reduceat(n, st) if len(st) \
            else np.empty(0, np.int64)
        sel = tot >= min_support
        return pa.table({"item_a": pa.array(a[st]),
                         "item_b": pa.array(b_[st]),
                         "item_c": pa.array(c[st]),
                         "support": pa.array(tot)}).filter(
            pa.array(sel))

    part_schema = pa.schema([
        ("__b", pa.int64()), ("a", pa.int64()), ("b", pa.int64()),
        ("c", pa.int64()), ("n", pa.int64())])
    tagged = ds.map_batches(pairs, batch_format="pyarrow")
    # first exchange's (triple, partial_count) output STAYS in the
    # object store — the candidate space is corpus-scale before the
    # support filter, so it must not visit the driver
    triples = grouped_exchange_ds(tagged, "__b", num_buckets,
                                  enum_triples,
                                  empty_schema=part_schema)
    cols = ("item_a", "item_b", "item_c", "support")
    counted = grouped_exchange(triples, "__b", num_buckets,
                               count_merge)
    if counted is None or counted.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    return (counted.to_pandas()
            .sort_values(["item_a", "item_b", "item_c"])
            .reset_index(drop=True).astype("int64"))


def cohort_ltv(events_ds, user_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value",
               num_buckets: int = 32) -> pd.DataFrame:
    """Cohort lifetime-value curve: users are cohorted by their FIRST
    event week; for each (cohort_week, week_offset) cell, the number
    of active users, event count and permille-floored value sum — the
    revenue-retention matrix behind every "LTV by signup cohort"
    dashboard, exact integers throughout.  Rows with null user / ts /
    value drop (a user's cohort week is the min over its surviving
    rows — SQL join-after-filter parity).

    Scale shape: ONE user-keyed hash exchange; each merge task holds
    its users' full histories, derives cohort week = per-user min
    (vectorized reduceat over (user, week)-sorted rows) and
    pre-aggregates to (cohort, offset) partials with EXACT distinct
    user counts (a user lives in exactly one bucket), so the driver
    fold is weeks^2-sized regardless of corpus size.
    """
    from ..stages.exchange import grouped_exchange

    WEEK = 7 * 86_400_000_000

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[user_col]),
                             pc.and_(pc.is_valid(b[ts_col]),
                                     pc.is_valid(b[value_col]))))
        u = pc.cast(b[user_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        wk = (pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                      pa.int64()).to_numpy(zero_copy_only=False)
              // WEEK)
        val = np.floor(1000.0 * b[value_col].to_numpy(
            zero_copy_only=False)).astype(np.int64)
        return pa.table({"__b": pa.array(u % num_buckets),
                         "u": pa.array(u), "wk": pa.array(wk),
                         "val": pa.array(val)})

    def fold(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        wk = t.column("wk").to_numpy(zero_copy_only=False)
        val = t.column("val").to_numpy(zero_copy_only=False)
        order = np.lexsort((wk, u))
        u, wk, val = u[order], wk[order], val[order]
        new_u = np.ones(len(u), dtype=bool)
        new_u[1:] = u[1:] != u[:-1]
        ustart = np.flatnonzero(new_u)
        ulen = np.diff(np.append(ustart, len(u)))
        cohort = np.repeat(wk[ustart], ulen)  # per-user min week
        off = wk - cohort
        # distinct (user, cohort, offset) combos for user counts
        new_cell = np.ones(len(u), dtype=bool)
        new_cell[1:] = (u[1:] != u[:-1]) | (off[1:] != off[:-1])
        cst = np.flatnonzero(new_cell)
        # per-(cohort, offset) partials over this bucket's users
        co = _pair_key(cohort, off)
        order2 = np.argsort(co, kind="stable")
        co_s, val_s = co[order2], val[order2]
        newg = np.ones(len(co_s), dtype=bool)
        newg[1:] = co_s[1:] != co_s[:-1]
        gst = np.flatnonzero(newg)
        n_ev = np.diff(np.append(gst, len(co_s)))
        sums = np.add.reduceat(val_s, gst) if len(gst) \
            else np.empty(0, np.int64)
        # distinct-user count per cell
        cou = co[cst]
        order3 = np.argsort(cou, kind="stable")
        cou = cou[order3]
        newu = np.ones(len(cou), dtype=bool)
        newu[1:] = cou[1:] != cou[:-1]
        ust = np.flatnonzero(newu)
        n_usr = np.diff(np.append(ust, len(cou)))
        # cells are identical sets (every cell has >= 1 user + event)
        return pa.table({
            "cohort_week": pa.array(co_s[gst] >> np.int64(20)),
            "week_offset": pa.array(co_s[gst] & np.int64(0xFFFFF)),
            "n_users": pa.array(n_usr),
            "n_events": pa.array(n_ev),
            "sum_value_pm": pa.array(sums)})

    tagged = (events_ds.select_columns([user_col, ts_col, value_col])
              .map_batches(tag, batch_format="pyarrow"))
    out = grouped_exchange(tagged, "__b", num_buckets, fold)
    cols = ("cohort_week", "week_offset", "n_users", "n_events",
            "sum_value_pm")
    if out is None or out.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    df = (out.to_pandas()
          .groupby(["cohort_week", "week_offset"], as_index=False)
          .sum())
    return (df.sort_values(["cohort_week", "week_offset"])
            .reset_index(drop=True).astype("int64"))


def _pair_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pack two small nonnegative int64s (b < 2^20) into one sortable
    int64 — cohort_ltv's (cohort_week, offset) cell key."""
    return (a << np.int64(20)) | b


def survival_gaps(ds, key_col: str = "user_id", ts_col: str = "ts",
                  num_buckets: int = 32) -> pd.DataFrame:
    """Survival-analysis input surface (Kaplan-Meier estimator data,
    Kaplan & Meier 1958): per key, the day gaps between consecutive
    events are OBSERVED durations; the gap from each key's last event
    to the corpus's final day is RIGHT-CENSORED (the next event
    hadn't happened when the data ends).  Returns the duration
    histogram ``(gap_days, n_observed, n_censored)`` — exact integers,
    the standard input to any time-to-next-event model (churn, repeat
    purchase).  Null key/ts rows drop; same-day ties contribute
    zero-length observed gaps (multiset of sorted-consecutive diffs —
    deterministic under ties).

    Scale shape: pass 1 is a scalar max-day reduction (per-batch max
    -> driver); pass 2 is ONE key-keyed hash exchange whose merges
    diff each key's sorted days vectorized (reduceat boundaries) and
    pre-bin locally, so only (gap, count) partials reach the driver.
    """
    from ..stages.exchange import grouped_exchange

    DAY = 86_400_000_000

    def days_of(b: pa.Table) -> np.ndarray:
        return (pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                        pa.int64()).to_numpy(zero_copy_only=False)
                // DAY)

    def batch_max(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[ts_col]))
        if b.num_rows == 0:
            return pa.table({"m": pa.array([], type=pa.int64())})
        return pa.table({"m": pa.array([days_of(b).max()])})

    mx = (ds.select_columns([ts_col])
          .map_batches(batch_max, batch_format="pyarrow").to_pandas())
    if len(mx) == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in
                             ("gap_days", "n_observed", "n_censored")})
    max_day = int(mx.m.max())

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[key_col]),
                             pc.is_valid(b[ts_col])))
        u = pc.cast(b[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({"__b": pa.array(u % num_buckets),
                         "u": pa.array(u),
                         "d": pa.array(days_of(b))})

    def fold(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, u))
        u, d = u[order], d[order]
        same = np.zeros(len(u), dtype=bool)
        same[1:] = u[1:] == u[:-1]
        gaps = np.empty(0, np.int64)
        if same.any():
            diffs = d[1:] - d[:-1]
            gaps = diffs[same[1:]]
        last = np.ones(len(u), dtype=bool)
        last[:-1] = u[1:] != u[:-1]
        cens = max_day - d[last]
        go, co = np.unique(gaps, return_counts=True)
        gc, cc = np.unique(cens, return_counts=True)
        return pa.table({
            "gap_days": pa.array(np.r_[go, gc]),
            "n_observed": pa.array(np.r_[co.astype(np.int64),
                                         np.zeros(len(gc), np.int64)]),
            "n_censored": pa.array(np.r_[np.zeros(len(go), np.int64),
                                         cc.astype(np.int64)])})

    tagged = (ds.select_columns([key_col, ts_col])
              .map_batches(tag, batch_format="pyarrow"))
    out = grouped_exchange(tagged, "__b", num_buckets, fold)
    cols = ("gap_days", "n_observed", "n_censored")
    if out is None or out.num_rows == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
    df = (out.to_pandas().groupby("gap_days", as_index=False).sum())
    return (df.sort_values("gap_days").reset_index(drop=True)
            .astype("int64"))


def distinctive_terms(docs_ds, k: int = 10, min_count: int = 5,
                      group_col: str = "lang",
                      text_col: str = "text",
                      num_buckets: int = 32) -> pd.DataFrame:
    """Distinctive vocabulary per group by integer LIFT: for each
    (group, word) with ``count >= min_count``, lift_pm =
    ``(1000 * c_gw * N) // (c_w * N_g)`` — how over-represented the
    word is in the group versus the corpus (the permille-floored
    pointwise-mutual-information ratio, Monroe et al.'s "fightin'
    words" shape without the log) — and each group's top-``k`` words
    by (lift DESC, word ASC).  Whitespace token contract.

    Scale shape: pass 1 reduces per-group token totals (groups-sized
    driver table, broadcast in the merge closure); pass 2 is ONE
    word-keyed hash exchange — a word's per-group counts co-locate,
    so its global count (the lift denominator) is bucket-local — and
    each merge emits only its own top-``k`` per group (global top-k
    is a subset of the union of per-bucket top-ks; driver re-ranks
    the k*buckets*groups survivors).
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange
    from .tokenize import _split_words

    def counts(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[group_col])))
        if b.num_rows == 0:
            return pa.table({"g": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        _, _, lens = _split_words(b, text_col)
        gnames = np.asarray(b[group_col].to_pylist(), dtype=object)
        ug, inv = np.unique(gnames, return_inverse=True)
        sums = np.bincount(inv, weights=lens).astype(np.int64)
        return pa.table({"g": pa.array(ug, type=pa.string()),
                         "n": pa.array(sums)})

    totals = (docs_ds.select_columns([group_col, text_col])
              .map_batches(counts, batch_format="pyarrow")
              .to_pandas().groupby("g").n.sum())
    group_names = np.array(sorted(totals.index), dtype=object)
    group_tot = totals[group_names].to_numpy(np.int64)
    n_total = int(group_tot.sum())

    def tag(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[text_col]),
                             pc.is_valid(b[group_col])))
        if b.num_rows == 0:
            return pa.table({"__b": pa.array([], type=pa.uint64()),
                             "w": pa.array([], type=pa.string()),
                             "g": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        words, parents, _ = _split_words(b, text_col)
        gnames = np.asarray(b[group_col].to_pylist(), dtype=object)
        gid = np.searchsorted(group_names, gnames)[parents]
        # block-local (word, group) pre-count
        order = np.lexsort((gid, words))
        ws, gs = words[order], gid[order]
        new = np.ones(len(ws), dtype=bool)
        new[1:] = (ws[1:] != ws[:-1]) | (gs[1:] != gs[:-1])
        st = np.flatnonzero(new)
        n = np.diff(np.append(st, len(ws))).astype(np.int64)
        ws, gs = ws[st], gs[st]
        wnew = np.ones(len(ws), dtype=bool)
        wnew[1:] = ws[1:] != ws[:-1]
        wst = np.flatnonzero(wnew)
        wcnt = np.diff(np.append(wst, len(ws)))
        h = md5_u64le(pa.array(ws[wst], type=pa.string())) \
            if len(wst) else np.empty(0, np.uint64)
        return pa.table({"__b": pa.array(np.repeat(h, wcnt),
                                         type=pa.uint64()),
                         "w": pa.array(ws, type=pa.string()),
                         "g": pa.array(gs), "n": pa.array(n)})

    def topk(t: pa.Table) -> pa.Table:
        w = t.column("w").to_numpy(zero_copy_only=False)
        g = t.column("g").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((g, w))
        w, g, n = w[order], g[order], n[order]
        new = np.ones(len(w), dtype=bool)
        new[1:] = (w[1:] != w[:-1]) | (g[1:] != g[:-1])
        st = np.flatnonzero(new)
        c = np.add.reduceat(n, st) if len(st) else np.empty(0,
                                                            np.int64)
        w, g = w[st], g[st]
        # per-word global count (word fully in this bucket)
        wnew = np.ones(len(w), dtype=bool)
        wnew[1:] = w[1:] != w[:-1]
        wst = np.flatnonzero(wnew)
        wlen = np.diff(np.append(wst, len(w)))
        cw = np.repeat(np.add.reduceat(c, wst) if len(wst)
                       else np.empty(0, np.int64), wlen)
        sel = c >= min_count
        w, g, c, cw = w[sel], g[sel], c[sel], cw[sel]
        lift = (1000 * c * n_total) // (cw * group_tot[g])
        # bucket-local top-k per group by (lift DESC, word ASC)
        order2 = np.lexsort((w, -lift, g))
        g2, w2, c2, l2 = g[order2], w[order2], c[order2], lift[order2]
        newg = np.ones(len(g2), dtype=bool)
        newg[1:] = g2[1:] != g2[:-1]
        rank = np.arange(len(g2)) - np.repeat(
            np.flatnonzero(newg),
            np.diff(np.append(np.flatnonzero(newg), len(g2))))
        keep = rank < k
        return pa.table({"g": pa.array(g2[keep]),
                         "word": pa.array(w2[keep], type=pa.string()),
                         "c": pa.array(c2[keep]),
                         "lift_pm": pa.array(l2[keep])})

    tagged = (docs_ds.select_columns([group_col, text_col])
              .map_batches(tag, batch_format="pyarrow"))
    out = grouped_exchange(tagged, "__b", num_buckets, topk)
    cols = [group_col, "word", "c", "lift_pm"]
    if out is None or out.num_rows == 0:
        return pd.DataFrame({group_col: pd.Series(dtype=object),
                             "word": pd.Series(dtype=object),
                             "c": pd.Series(dtype="int64"),
                             "lift_pm": pd.Series(dtype="int64")})
    df = out.to_pandas()
    df[group_col] = group_names[df.g.to_numpy()]
    df = df.sort_values([group_col, "word"])
    # global top-k by (lift DESC, word ASC) within each group
    df = (df.sort_values([group_col, "lift_pm", "word"],
                         ascending=[True, False, True])
          .groupby(group_col, as_index=False).head(k))
    return (df[cols].reset_index(drop=True)
            .astype({"c": "int64", "lift_pm": "int64"}))


def daily_periodicity(events_ds, ts_col: str = "ts",
                      max_lag: int = 7) -> pd.DataFrame:
    """WEEKLY-RHYTHM detection surface — integer autocovariance raw
    moments of the daily event-count series at lags 1..``max_lag``
    (a lag-7 spike is the weekly cycle; a flat profile means load is
    memoryless): the series is the ZERO-FILLED count per epoch-day
    over the observed [min_day, max_day] spine (absent days count 0 —
    a silent day is signal, not a missing sample).  Per lag the
    surface carries every moment Pearson needs, all int64-exact:
    ``(lag, n_pairs, sum_xy, sum_head, sum_tail, sum_head_sq,
    sum_tail_sq)`` where head = x[:-lag], tail = x[lag:].  Null ts
    drop.  Lags ≥ the spine length emit nothing.

    Scale shape: daily counts reduce as (day, count) partials through
    ``grouped_stats`` — the driver holds only a days-sized series
    (≤ tens of thousands of rows for decades of data), then one numpy
    pass per lag.
    """
    import pyarrow.compute as pc

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[ts_col]))
        day = (pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                       pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        return pa.table({"day": pa.array(day),
                         "__one": pa.array(
                             np.ones(b.num_rows, np.int64))})

    cols = ("lag", "n_pairs", "sum_xy", "sum_head", "sum_tail",
            "sum_head_sq", "sum_tail_sq")
    counts = grouped_stats(
        events_ds.select_columns([ts_col])
        .map_batches(prep, batch_format="pyarrow"),
        ["day"], {"__one": ["sum"]})
    if counts.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    d = counts.day.to_numpy(np.int64)
    c = counts["__one_sum"].to_numpy(np.int64)
    lo, hi = int(d.min()), int(d.max())
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    x[d - lo] = c
    rows = []
    for lag in range(1, max_lag + 1):
        if lag >= len(x):
            break
        h, t = x[:-lag], x[lag:]
        rows.append({"lag": lag, "n_pairs": len(h),
                     "sum_xy": int((h * t).sum()),
                     "sum_head": int(h.sum()),
                     "sum_tail": int(t.sum()),
                     "sum_head_sq": int((h * h).sum()),
                     "sum_tail_sq": int((t * t).sum())})
    return pd.DataFrame(rows).astype("int64")


def peak_load_window(events_ds, ts_col: str = "ts") -> pd.DataFrame:
    """ANOMALY-WINDOW localization — the contiguous day span whose
    load most exceeds the average rate (the "when did the incident
    actually run" answer behind a spiky daily chart): over the
    zero-filled daily count series x on the [min_day, max_day] spine
    (D days, T total events), each day's integer deviation is
    ``d_i = x_i·D − T`` (mean-centered, scaled by D so it stays
    integral); the result is the maximum-sum nonempty subarray of d —
    ties resolved to the smallest start day, then the smallest end
    day.  Null ts drop.  Returns ONE row
    ``(start_day, end_day, n_days, score_x)`` with
    ``score_x = window_sum·D − window_len·T``.

    Scale shape: daily counts reduce as (day, count) partials through
    ``grouped_stats``; the Kadane scan runs on the days-sized driver
    series (O(D), exact tie handling via earliest prefix-argmin).
    """
    import pyarrow.compute as pc

    def prep(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[ts_col]))
        day = (pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                       pa.int64()).to_numpy(zero_copy_only=False)
               // 86_400_000_000)
        return pa.table({"day": pa.array(day),
                         "__one": pa.array(
                             np.ones(b.num_rows, np.int64))})

    cols = ("start_day", "end_day", "n_days", "score_x")
    counts = grouped_stats(
        events_ds.select_columns([ts_col])
        .map_batches(prep, batch_format="pyarrow"),
        ["day"], {"__one": ["sum"]})
    if counts.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    d0 = counts.day.to_numpy(np.int64)
    c = counts["__one_sum"].to_numpy(np.int64)
    lo, hi = int(d0.min()), int(d0.max())
    x = np.zeros(hi - lo + 1, dtype=np.int64)
    x[d0 - lo] = c
    D, T = len(x), int(x.sum())
    dev = x * D - T
    P = np.concatenate([[0], np.cumsum(dev)])  # P[0..D]
    # for each end j (1-based in P): earliest argmin of P[0..j-1]
    run_min = np.minimum.accumulate(P[:-1])
    first_at = np.zeros(D, dtype=np.int64)
    # earliest index attaining the running min: changes only when a
    # strictly smaller prefix appears
    is_new = np.ones(D, dtype=bool)
    is_new[1:] = P[1:-1] < run_min[:-1]
    first_at = np.maximum.accumulate(
        np.where(is_new, np.arange(D), -1))
    score = P[1:] - run_min
    M = int(score.max())
    cand = np.flatnonzero(score == M)
    starts = first_at[cand]             # i-1 (0-based prefix index)
    order = np.lexsort((cand, starts))  # min start, then min end
    i0, j0 = int(starts[order[0]]), int(cand[order[0]])
    return pd.DataFrame([{
        "start_day": lo + i0, "end_day": lo + j0,
        "n_days": j0 - i0 + 1, "score_x": M}]).astype("int64")


def coverage_curve(rows_ds, key_col: str = "token",
                   max_pow: int = 20,
                   num_buckets: int = 32) -> pd.DataFrame:
    """HEAD-COVERAGE curve — "how much of the corpus do the top-k
    keys cover, for k = 1, 2, 4, …?" (the vocabulary-size /
    cache-size planning curve; :func:`rank_decile_mass`'s cumulative
    complement): keys ranked by count descending (tie order cannot
    change a top-k mass — every key of a count-run contributes the
    same count), and for each power-of-two ``k ≤ min(2^max_pow, V)``
    plus ``k = V`` the summed occurrences of the top-k ranks and its
    permille of the corpus.  Null keys drop.  Returns
    ``(k, mass, mass_pm)`` ascending in k.

    Scale shape: the shared count-histogram exchange
    (`_key_count_histogram`); the driver walks only distinct count
    values.
    """
    cv, nk = _key_count_histogram(rows_ds, key_col, num_buckets)
    cols = ("k", "mass", "mass_pm")
    if not len(cv):
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in cols})
    V = int(nk.sum())
    total = int((cv * nk).sum())
    cum_keys = np.cumsum(nk)
    cum_events = np.cumsum(cv * nk)

    def events_top(r: int) -> int:
        if r <= 0:
            return 0
        i = int(np.searchsorted(cum_keys, r))
        before_e = int(cum_events[i - 1]) if i else 0
        before_k = int(cum_keys[i - 1]) if i else 0
        return before_e + (r - before_k) * int(cv[i])

    ks = [1 << p for p in range(max_pow + 1) if (1 << p) < V]
    ks.append(V)
    rows = [{"k": k, "mass": events_top(k),
             "mass_pm": 1000 * events_top(k) // total} for k in ks]
    return pd.DataFrame(rows).astype("int64")


def fact_count_histogram_by_dim(fact_ds, fact_key: str, dim_ds,
                                dim_key: str, dim_col: str,
                                num_buckets: int = 64) -> pd.DataFrame:
    """Fill-rate audit — the distribution of fact rows per dimension
    key, split by a dimension attribute ("how many lineitems does an
    order have, by order status"): for every dim row, count its fact
    rows (0 if none — LEFT JOIN semantics) and histogram the counts
    per attribute value.  SQL parity::

        SELECT dim_col, COALESCE(cnt, 0) AS cnt, COUNT(*) AS n_keys
        FROM dim LEFT JOIN (SELECT key, COUNT(*) cnt FROM fact
                            GROUP BY 1) USING (key)
        WHERE dim.key IS NOT NULL AND dim_col IS NOT NULL
        GROUP BY 1, 2

    Scale shape: fact batches collapse to per-batch ``(key, cnt)``
    partials map-side, both sides meet in ONE key-hashed tagged-union
    exchange, and each merge task emits an attribute × count-value
    histogram — the driver merges only
    ``attributes × distinct-count-values`` rows, never a keys-sized
    frame (the `_key_count_histogram` shape extended with a dimension
    join).  Null fact keys drop (they match no dim row); dim rows with
    a null key or null attribute drop (restated in the SQL).  Fact
    keys absent from ``dim_ds`` drop (no attribute to report under).

    Partitioning assumption: one key's partials fit a merge task
    (bounded by #blocks, not fact rows).
    """
    from ..stages.exchange import grouped_exchange

    def fact_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b[fact_key]))
        k = pc.cast(b[fact_key], pa.int64()).to_numpy(
            zero_copy_only=False)
        uk, cnt = np.unique(k, return_counts=True)
        return pa.table({
            "__b": pa.array(
                (uk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 % np.uint64(num_buckets)).astype(np.int64)),
            "k": pa.array(uk), "c": pa.array(cnt.astype(np.int64)),
            "dim": pa.array([""] * len(uk), type=pa.string()),
            "tag": pa.array(np.zeros(len(uk), np.int64))})

    def dim_part(b: pa.Table) -> pa.Table:
        b = b.filter(pc.and_(pc.is_valid(b[dim_key]),
                             pc.is_valid(b[dim_col])))
        k = pc.cast(b[dim_key], pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "__b": pa.array(
                (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                 % np.uint64(num_buckets)).astype(np.int64)),
            "k": pa.array(k),
            "c": pa.array(np.zeros(len(k), np.int64)),
            "dim": pc.cast(b[dim_col], pa.string()),
            "tag": pa.array(np.ones(len(k), np.int64))})

    def resolve(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        tag = t.column("tag").to_numpy(zero_copy_only=False)
        dim = np.asarray(t.column("dim").to_pylist(), dtype=object)
        order = np.lexsort((tag, k))  # per key: fact rows, then dim
        k, c, tag, dim = k[order], c[order], tag[order], dim[order]
        st = (np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
              if len(k) else np.empty(0, np.int64))
        n = np.diff(np.append(st, len(k)))
        last = st + n - 1
        has_dim = tag[last] == 1
        cnt_per_key = (np.add.reduceat(c, st) if len(st)
                       else np.empty(0, np.int64))[has_dim]
        dim_per_key = dim[last][has_dim]
        # attribute x count histogram, merged tiny on the driver
        dcodes, dinv = np.unique(dim_per_key, return_inverse=True)
        pairs = dinv * (cnt_per_key.max() + 1 if len(cnt_per_key)
                        else 1) + cnt_per_key
        up, pc_counts = np.unique(pairs, return_counts=True)
        width = cnt_per_key.max() + 1 if len(cnt_per_key) else 1
        return pa.table({
            dim_col: pa.array(dcodes[up // width]),
            "cnt": pa.array((up % width).astype(np.int64)),
            "n_keys": pa.array(pc_counts.astype(np.int64))})

    facts = fact_ds.map_batches(fact_part, batch_format="pyarrow")
    dims = dim_ds.map_batches(dim_part, batch_format="pyarrow")
    res = grouped_exchange(facts.union(dims), "__b", num_buckets,
                           resolve)
    cols = (dim_col, "cnt", "n_keys")
    if res is None or res.num_rows == 0:
        return pd.DataFrame({dim_col: pd.Series(dtype=object),
                             "cnt": pd.Series(dtype="int64"),
                             "n_keys": pd.Series(dtype="int64")})
    df = (res.to_pandas().groupby([dim_col, "cnt"], as_index=False)
          ["n_keys"].sum())
    df["cnt"] = df.cnt.astype("int64")
    df["n_keys"] = df.n_keys.astype("int64")
    return (df.sort_values([dim_col, "cnt"])
            .reset_index(drop=True))


def grouped_mode_multi(ds, keys: list[str], col: str) -> pd.DataFrame:
    """Per-group EXACT mode of a bounded-cardinality NUMERIC value
    column over MULTIPLE group keys (deterministic tie rule: highest
    count, then SMALLEST value in the value's NUMERIC order) — the
    multi-key numeric companion to :func:`grouped_mode` (single key,
    string tie order, exchange-resident merge), adding the group
    total ``n_rows``.

    Scale shape: counting rides ``grouped_stats`` (map-side combiner,
    cardinality-guarded merge), so the driver only ever sees the
    (keys x distinct values) count surface — bounded for enum-like /
    quantized columns, which is this operator's stated domain (for
    continuous columns quantize first; the surface, not the data,
    must fit the driver).  Rows with a null key or value drop.

    Returns one row per group: keys, ``mode_<col>``, ``mode_count``,
    ``n_rows`` (group total).
    """
    def one(batch: pa.Table) -> pa.Table:
        m = pc.is_valid(batch[keys[0]])
        for k in keys[1:] + [col]:
            m = pc.and_(m, pc.is_valid(batch[k]))
        batch = batch.filter(m)
        return batch.append_column(
            "__one", pa.array(np.ones(batch.num_rows, np.int64)))

    surf = grouped_stats(ds.map_batches(one, batch_format="pyarrow"),
                         keys + [col], {"__one": ["sum"]})
    if not len(surf):
        out = pd.DataFrame(columns=keys + [f"mode_{col}",
                                           "mode_count", "n_rows"])
        return out
    # deterministic argmax: count DESC, value ASC within each group
    surf = surf.sort_values(keys + [col]).reset_index(drop=True)
    grp = surf.groupby(keys, sort=True)
    idx = grp["__one_sum"].idxmax()  # first max -> smallest value
    out = surf.loc[idx, keys + [col, "__one_sum"]].rename(
        columns={col: f"mode_{col}", "__one_sum": "mode_count"})
    out["n_rows"] = grp["__one_sum"].sum().to_numpy(np.int64)
    out["mode_count"] = out.mode_count.astype("int64")
    return out.reset_index(drop=True)


def grouped_drawdown(ds, group_col: str, day_col: str, val_col: str
                     ) -> pd.DataFrame:
    """Per-group max drawdown of a DAILY integer series: the largest
    peak-to-trough decline ``max_t (running_max - v_t)`` over the
    group's days present (ascending), with the EARLIEST day achieving
    it — the revenue-collapse / traffic-dip audit.

    Input must already carry (group, day, integer value) columns; the
    daily roll-up rides ``grouped_stats`` (map-side combiner), so the
    driver fold sees a (groups x days) surface — bounded because day
    granularity is bounded, never row-scale.  Null group/day/value
    rows drop.

    Returns per group: ``n_days``, ``max_dd`` (>= 0), ``dd_day``
    (earliest argmax day), ``peak_at_dd`` (running max at that day).
    """
    daily = grouped_stats(ds, [group_col, day_col], {val_col: ["sum"]})
    cols = [group_col, "n_days", "max_dd", "dd_day", "peak_at_dd"]
    if not len(daily):
        return pd.DataFrame(columns=cols)
    daily = daily.sort_values([group_col, day_col]).reset_index(drop=True)
    rows = []
    for g, sub in daily.groupby(group_col, sort=True):
        v = sub[f"{val_col}_sum"].to_numpy(np.int64)
        d = sub[day_col].to_numpy(np.int64)
        peak = np.maximum.accumulate(v)
        dd = peak - v
        i = int(np.argmax(dd))  # first max == earliest day
        rows.append((g, len(v), int(dd[i]), int(d[i]), int(peak[i])))
    return pd.DataFrame(rows, columns=cols)


def mean_shift_split(ds, day_col: str, val_col: str) -> pd.DataFrame:
    """Single CHANGE-POINT over a daily integer series: the split of
    the day-ordered series maximizing the classic CUSUM deviation
    ``score = |S_L*n_t - n_L*S_t|`` (identically ``n_L*n_R*|mean_L -
    mean_R|`` — the denominator-free weighted mean shift; ties ->
    smallest split day).  The regime-change day a pipeline operator
    reads before trusting a drift alarm; complements the sequential
    one-sided CUSUM alarm (``cusum`` query) with a retrospective
    argmax estimate.

    Scale shape: the daily roll-up rides ``grouped_stats`` (map-side
    combiner), the O(days) argmax folds a day-granularity surface on
    the driver — bounded by the calendar, never by rows.  Overflow
    bound: |S_t|*n_t ≤ total*days, int64-safe far beyond 100-TB daily
    totals (1e12 * 1e5 < 2^62).

    Returns ONE row: ``split_day`` (last day of the left segment),
    ``n_left, sum_left, n_right, sum_right, score`` plus
    ``mean_left_pm/mean_right_pm`` (``floor(1000*S/n)``).
    """
    daily = grouped_stats(ds, [day_col], {val_col: ["sum"]})
    cols = ["split_day", "n_left", "sum_left", "n_right",
            "sum_right", "score", "mean_left_pm", "mean_right_pm"]
    if len(daily) < 2:
        return pd.DataFrame(columns=cols)
    daily = daily.sort_values(day_col).reset_index(drop=True)
    d = daily[day_col].to_numpy(np.int64)
    v = daily[f"{val_col}_sum"].to_numpy(np.int64)
    nt, st = len(v), int(v.sum())
    s1 = np.cumsum(v)[:-1]          # left sums for splits 1..nt-1
    n1 = np.arange(1, nt, dtype=np.int64)
    score = np.abs(s1 * nt - n1 * st)
    i = int(np.argmax(score))       # first max == smallest split day
    nl, sl = int(n1[i]), int(s1[i])
    nr, sr = nt - nl, st - sl
    return pd.DataFrame([{
        "split_day": int(d[nl - 1]), "n_left": nl, "sum_left": sl,
        "n_right": nr, "sum_right": sr, "score": int(score[i]),
        "mean_left_pm": 1000 * sl // nl,
        "mean_right_pm": 1000 * sr // nr}])


def burstiness_log_hist(ds, key_col: str, day_col: str,
                        num_buckets: int = 64) -> pd.DataFrame:
    """Per-key INTERARRIVAL-BURSTINESS census over a day timeline —
    "do a part's shipments (a user's visits, a doc's republications)
    arrive evenly or in bursts?" binned into a log2 histogram: per
    key, over its DISTINCT active days ascending, gaps ``g_i``, the
    scale-free integer band ``band = 1000*n_g*Σg² // (Σg)²`` (≥ 1000
    by Cauchy–Schwarz; 1000 = perfectly even, larger = burstier),
    bucketed at ``bin = floor(log2(band // 1000))``.  Keys with < 2
    distinct days are excluded (no gap exists).

    Scale shape: batches pre-dedupe (key, day) map-side, ONE
    key-keyed exchange folds each key's day set exactly once and
    emits per-BIN count partials — histogram-sized, never key-sized.
    The bit-length uses exact float64 exponent extraction
    (``np.frexp``; k < 2^53 — day counts are calendar-bounded).
    Returns ``(bin, n_keys)`` sorted by bin.
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[key_col]), pc.is_valid(b[day_col]))
        b = b.filter(m)
        k = pc.cast(b[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = pc.cast(b[day_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        keep = np.ones(len(k), dtype=bool)
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d = k[keep], d[keep]
        return pa.table({"k": pa.array(k), "d": pa.array(d),
                         "__b": pa.array(k % num_buckets)})

    def fold(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        keep = np.ones(len(k), dtype=bool)       # re-dedupe partials
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d = k[keep], d[keep]
        st = np.flatnonzero(np.r_[True, k[1:] != k[:-1]]) \
            if len(k) else np.empty(0, np.int64)
        n = np.diff(np.append(st, len(k)))
        # within-key gaps: adjacent diffs with each key's first row
        # (and the sentinel) zeroed, summed per key via reduceat
        gg = np.diff(np.concatenate(([d[0] if len(d) else 0], d)))
        gg[st] = 0
        sum_g = np.add.reduceat(gg, st) if len(st) else \
            np.empty(0, np.int64)
        sum_g2 = np.add.reduceat(gg * gg, st) if len(st) else \
            np.empty(0, np.int64)
        n_g = n - 1
        ok = n_g >= 1                            # >= 2 distinct days
        band = np.zeros(ok.sum(), np.int64)
        if ok.any():
            band = (1000 * n_g[ok] * sum_g2[ok]) // \
                (sum_g[ok] * sum_g[ok])
        kk = band // 1000                        # >= 1
        bins = (np.frexp(kk.astype(np.float64))[1] - 1).astype(
            np.int64)
        ub, cnt = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(ub.astype(np.int64)),
                         "n_keys": pa.array(cnt.astype(np.int64))})

    out = grouped_exchange(ds.map_batches(tag, batch_format="pyarrow"),
                           "__b", num_buckets, fold)
    if out is None or out.num_rows == 0:
        return pd.DataFrame({"bin": pd.Series(dtype="int64"),
                             "n_keys": pd.Series(dtype="int64")})
    df = (out.to_pandas().groupby("bin", as_index=False)
          ["n_keys"].sum())
    return (df.sort_values("bin").reset_index(drop=True)
            .astype("int64"))


def ks_census_vs_global(ds, group_col: str, value_col: str
                        ) -> pd.DataFrame:
    """Per-slice EXACT Kolmogorov–Smirnov census against the GLOBAL
    distribution — "which sources' length (value) distribution
    deviates most from the corpus?" (:func:`ks_surface` compares one
    chosen pair; this audits every slice at once): per slice ``g``,
    ``ks_num = max_x |N·C_g(x) − n_g·C(x)|`` over the union of
    observed values (cross-multiplied integers; the true D is
    ``ks_num/(n_g·N)``, reported as ``ks_pm`` via Python-int division
    — n_g·N exceeds int64 at web scale), and ``at_value``, the
    smallest value attaining the max.  Null group/value rows drop.

    Scale shape: per-batch partial counts collapse to (group, value)
    pairs through the cardinality-guarded ``grouped_stats`` merge;
    the driver fold is a (slices × distinct values) surface — the
    same discrete/bounded-value contract as ``ks_surface``.
    Returns ``(group_col, n, ks_num, at_value, ks_pm)``.
    """
    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[group_col]),
                    pc.is_valid(b[value_col]))
        b2 = pa.table({"g": pc.cast(b[group_col], pa.string()),
                       "v": b[value_col]}).filter(m)
        return b2.append_column(
            "__one", pa.array(np.ones(b2.num_rows, np.int64)))

    counts = grouped_stats(
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow"),
        ["g", "v"], {"__one": ["sum"]}).rename(
            columns={"__one_sum": "c"})
    cols = [group_col, "n", "ks_num", "at_value", "ks_pm"]
    if counts.empty:
        return pd.DataFrame({c: pd.Series(
            dtype="string" if c == group_col else "int64")
            for c in cols})
    piv = (counts.pivot_table(index="v", columns="g", values="c",
                              fill_value=0, aggfunc="sum")
           .sort_index())
    mat = piv.to_numpy(np.int64).cumsum(axis=0)  # per-slice cum
    glob = mat.sum(axis=1)                       # global cum
    n_g = mat[-1, :]
    big_n = int(glob[-1])
    rows = []
    vals = piv.index.to_numpy()
    for j, g in enumerate(piv.columns):
        diff = np.abs(big_n * mat[:, j] - int(n_g[j]) * glob)
        i = int(np.argmax(diff))                 # first max
        ks = int(diff[i])
        rows.append((g, int(n_g[j]), ks, int(vals[i]),
                     1000 * ks // (int(n_g[j]) * big_n)
                     if n_g[j] else 0))
    out = pd.DataFrame(rows, columns=cols)
    return (out.sort_values(group_col).reset_index(drop=True)
            .astype({"n": "int64", "ks_num": "int64",
                     "at_value": "int64", "ks_pm": "int64"}))


def domain_hole_audit(ds, group_col: str, val_col: str,
                      num_buckets: int = 32) -> pd.DataFrame:
    """Per-group DOMAIN-CONTINUITY audit over an integer value
    column — "does this type's value domain have a hole?" (clamping,
    unit mix-ups, and dropped subranges show up as an abnormally
    large gap between consecutive DISTINCT values): per group, the
    sorted distinct values' largest adjacent gap and its left
    endpoint (tie -> smallest left value), plus the domain bounds.
    Groups with one distinct value report ``max_gap = 0``.

    Scale shape: batches pre-dedupe (group, value) map-side, ONE
    group-keyed exchange folds each group's distinct-value set
    exactly once — bounded by the value DOMAIN, not the row count
    (the discrete/bounded-value contract shared with the KS ops).
    Returns ``(group_col, n_distinct, lo, hi, max_gap, gap_left)``.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[group_col]),
                    pc.is_valid(b[val_col]))
        b = b.filter(m)
        g = pc.cast(b[group_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        v = pc.cast(b[val_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((v, g.astype(str)))
        g, v = g[order], v[order]
        keep = np.ones(len(v), dtype=bool)
        gs = g.astype(str)
        keep[1:] = (gs[1:] != gs[:-1]) | (v[1:] != v[:-1])
        g, v = g[keep], v[keep]
        h = md5_u64le(pa.array(g.astype(str).astype(object),
                               type=pa.string()))
        return pa.table({"g": pa.array(g, type=pa.string()),
                         "v": pa.array(v),
                         "__b": pa.array(
                             (h % np.uint64(num_buckets))
                             .astype(np.int64))})

    def fold(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False).astype(str)
        v = t.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, g))
        g, v = g[order], v[order]
        keep = np.ones(len(v), dtype=bool)       # re-dedupe partials
        keep[1:] = (g[1:] != g[:-1]) | (v[1:] != v[:-1])
        g, v = g[keep], v[keep]
        st = np.flatnonzero(np.r_[True, g[1:] != g[:-1]]) \
            if len(g) else np.empty(0, np.int64)
        n = np.diff(np.append(st, len(g)))
        gaps = np.diff(v).astype(np.int64)
        gaps[st[1:] - 1] = -1 if len(st) > 1 else gaps[:0]
        rows = []
        for s, c in zip(st, n):
            seg = gaps[s:s + c - 1]
            if len(seg):
                i = int(np.argmax(seg))          # first max: min left
                rows.append((g[s], int(c), int(v[s]),
                             int(v[s + c - 1]), int(seg[i]),
                             int(v[s + i])))
            else:
                rows.append((g[s], 1, int(v[s]), int(v[s]), 0,
                             int(v[s])))
        return pa.table({
            "g": pa.array([r[0] for r in rows], type=pa.string()),
            "n_distinct": pa.array([r[1] for r in rows],
                                   type=pa.int64()),
            "lo": pa.array([r[2] for r in rows], type=pa.int64()),
            "hi": pa.array([r[3] for r in rows], type=pa.int64()),
            "max_gap": pa.array([r[4] for r in rows],
                                type=pa.int64()),
            "gap_left": pa.array([r[5] for r in rows],
                                 type=pa.int64())})

    out = grouped_exchange(ds.map_batches(tag, batch_format="pyarrow"),
                           "__b", num_buckets, fold)
    cols = [group_col, "n_distinct", "lo", "hi", "max_gap",
            "gap_left"]
    if out is None or out.num_rows == 0:
        return pd.DataFrame({c: pd.Series(
            dtype="string" if c == group_col else "int64")
            for c in cols})
    df = out.to_pandas().rename(columns={"g": group_col})
    return (df.sort_values(group_col).reset_index(drop=True)
            .astype({c: "int64" for c in cols[1:]}))


def day_fill_hist(ds, key_col: str, day_col: str,
                  num_buckets: int = 64) -> pd.DataFrame:
    """Per-key calendar-FILL census — "do users (parts, docs) stay
    active across their lifetime, or appear then vanish?" the density
    companion to :func:`burstiness_log_hist` (shape): per key, over
    its DISTINCT active days, ``fill_pm = 1000 * n_days // span``
    with ``span = last - first + 1`` (1000 = active every day of its
    life), bucketed into 11 bands ``band = fill_pm // 100`` (0..10;
    single-day keys land in band 10).

    Scale shape: batches pre-dedupe (key, day) map-side, ONE
    key-keyed exchange folds each key's day set exactly once and
    emits per-band count partials — 11 rows per bucket, never
    key-sized.  Returns ``(band, n_keys)`` sorted by band.
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[key_col]), pc.is_valid(b[day_col]))
        b = b.filter(m)
        k = pc.cast(b[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        d = pc.cast(b[day_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        keep = np.ones(len(k), dtype=bool)
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d = k[keep], d[keep]
        return pa.table({"k": pa.array(k), "d": pa.array(d),
                         "__b": pa.array(k % num_buckets)})

    def fold(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, k))
        k, d = k[order], d[order]
        keep = np.ones(len(k), dtype=bool)       # re-dedupe partials
        keep[1:] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        k, d = k[keep], d[keep]
        st = np.flatnonzero(np.r_[True, k[1:] != k[:-1]]) \
            if len(k) else np.empty(0, np.int64)
        n = np.diff(np.append(st, len(k)))
        last = st + n - 1
        span = d[last] - d[st] + 1
        fill = 1000 * n // span
        band = fill // 100
        ub, cnt = np.unique(band, return_counts=True)
        return pa.table({"band": pa.array(ub.astype(np.int64)),
                         "n_keys": pa.array(cnt.astype(np.int64))})

    out = grouped_exchange(ds.map_batches(tag, batch_format="pyarrow"),
                           "__b", num_buckets, fold)
    if out is None or out.num_rows == 0:
        return pd.DataFrame({"band": pd.Series(dtype="int64"),
                             "n_keys": pd.Series(dtype="int64")})
    df = (out.to_pandas().groupby("band", as_index=False)
          ["n_keys"].sum())
    return (df.sort_values("band").reset_index(drop=True)
            .astype("int64"))


def dominant_value_hist(ds, key_col: str, val_col: str,
                        num_buckets: int = 64) -> pd.DataFrame:
    """Per-entity DOMINANT-value census — "what is each customer's
    habitual weekday (each user's home type, each part's usual
    supplier), histogrammed over the population?": per key, the mode
    of an integer value column (tie -> highest count, then SMALLEST
    value), reduced to a ``(value, n_keys)`` histogram — the
    scale-safe alternative to materializing a per-key mode table
    when only the population mix is needed.

    Scale shape: batches pre-aggregate (key, value) counts map-side,
    ONE key-keyed exchange finalizes each key's counts exactly once,
    argmaxes in the bucket and emits per-VALUE key-count partials —
    value-domain-sized, never key-sized.  Null key/value rows drop.
    """
    import pyarrow.compute as pc

    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(b[key_col]), pc.is_valid(b[val_col]))
        b = b.filter(m)
        k = pc.cast(b[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        v = pc.cast(b[val_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        first = np.ones(len(k), dtype=bool)
        first[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
        st = np.flatnonzero(first)
        cnt = np.diff(np.append(st, len(k))).astype(np.int64)
        k, v = k[st], v[st]
        return pa.table({"k": pa.array(k), "v": pa.array(v),
                         "c": pa.array(cnt),
                         "__b": pa.array(k % num_buckets)})

    def fold(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        k, v, c = k[order], v[order], c[order]
        first = np.ones(len(k), dtype=bool)      # merge partials
        first[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
        st = np.flatnonzero(first)
        cs = np.add.reduceat(c, st) if len(st) else \
            np.empty(0, np.int64)
        k, v = k[st], v[st]
        # per-key argmax: count DESC then value ASC — lexsort by
        # (key, -count, value) and take each key's first row
        order2 = np.lexsort((v, -cs, k))
        k, v, cs = k[order2], v[order2], cs[order2]
        kst = np.flatnonzero(np.r_[True, k[1:] != k[:-1]]) \
            if len(k) else np.empty(0, np.int64)
        winners = v[kst]
        uv, cnt = np.unique(winners, return_counts=True)
        return pa.table({"v": pa.array(uv.astype(np.int64)),
                         "n_keys": pa.array(cnt.astype(np.int64))})

    out = grouped_exchange(ds.map_batches(tag, batch_format="pyarrow"),
                           "__b", num_buckets, fold)
    if out is None or out.num_rows == 0:
        return pd.DataFrame({val_col: pd.Series(dtype="int64"),
                             "n_keys": pd.Series(dtype="int64")})
    df = (out.to_pandas().groupby("v", as_index=False)
          ["n_keys"].sum().rename(columns={"v": val_col}))
    return (df.sort_values(val_col).reset_index(drop=True)
            .astype("int64"))


def ewma_alarms(ds, key_col: str, order_col: str, value_col: str,
                num_buckets: int = 16) -> pd.DataFrame:
    """Per-key EWMA control chart over an ordered integer series —
    the smoothed-level sibling of :func:`cusum_alarms` (Roberts 1959;
    same monitoring role as the reference's drift checks,
    verify.rs-style accumulate-don't-abort semantics): with alpha =
    1/8 in scale-1000 fixed point, ``e_1 = 1000*x_1`` and ``e_t =
    (7*e_{t-1} + 1000*x_t) // 8``; an alarm fires at t >= 2 when
    ``1000*x_t > 2*e_{t-1}`` (the raw value spikes above twice the
    smoothed level BEFORE the spike is absorbed).  Exact integers
    throughout — every register is restatable in SQL (recursive CTE),
    so the oracle pins the full recurrence, floor division included.

    Unlike CUSUM there is no cumsum/running-min identity for a
    floored linear recurrence, so each key runs a sequential loop —
    over its ORDER GRAIN (e.g. days), never rows; callers
    pre-aggregate to the grain first.  Distributed shape: ONE
    key-keyed exchange; alarms/level merge never leaves the bucket.

    Returns (key, n_days, n_alarms, ewma_final) sorted by key.
    """
    from ..functions.hashing import md5_u64le
    from ..stages.exchange import grouped_exchange

    def tag(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.and_(pc.is_valid(b[key_col]),
                               pc.is_valid(b[order_col])),
                       pc.is_valid(b[value_col]))
        b = b.select([key_col, order_col, value_col]).filter(keep)
        hv = md5_u64le(pc.cast(b[key_col], pa.string()))
        return b.append_column(
            "__b", pa.array((hv % np.uint64(num_buckets))
                            .astype(np.int64)))

    def stat(t: pa.Table) -> pa.Table:
        g = pc.cast(t[key_col], pa.string()).to_numpy(
            zero_copy_only=False).astype(object)
        o = pc.cast(t[order_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        x = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        srt = np.lexsort((o, g))
        gs, xs = g[srt], x[srt]
        first = np.ones(len(gs), dtype=bool)
        first[1:] = gs[1:] != gs[:-1]
        start = np.flatnonzero(first)
        cnt = np.diff(np.append(start, len(gs)))
        keys, n_alarm, e_fin, n_days = [], [], [], []
        for s0, c0 in zip(start, cnt):
            seq = xs[s0:s0 + c0]
            e = 1000 * int(seq[0])
            al = 0
            for v in seq[1:]:
                if 1000 * int(v) > 2 * e:
                    al += 1
                e = (7 * e + 1000 * int(v)) // 8
            keys.append(gs[s0])
            n_alarm.append(al)
            e_fin.append(e)
            n_days.append(int(c0))
        return pa.table({
            key_col: pa.array(keys, pa.string()),
            "n_days": pa.array(np.array(n_days, np.int64)),
            "n_alarms": pa.array(np.array(n_alarm, np.int64)),
            "ewma_final": pa.array(np.array(e_fin, np.int64))})

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    res = grouped_exchange(tagged, "__b", num_buckets, stat)
    cols = [key_col, "n_days", "n_alarms", "ewma_final"]
    if res is None or res.num_rows == 0:
        return pd.DataFrame({cols[0]: pd.Series(dtype=object),
                             **{c: pd.Series(dtype="int64")
                                for c in cols[1:]}})
    return (res.to_pandas()[cols].sort_values(key_col)
            .reset_index(drop=True)
            .astype({c: "int64" for c in cols[1:]}))
