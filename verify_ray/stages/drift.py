"""W3 — distribution-drift checks (per-group quantiles + token
frequencies vs a reference epoch).

Generalizes the reference's "value within expected set/range" (K3-K8,
/root/reference/verify-macros/../macros.rs:116-315) from scalars to
distributions (SURVEY §2.6 W3).

Execution shape (all streaming, no full materialization):

  map_batches(per-batch partial sketches)     one tiny row per (group, batch)
    → map_batches(merge within block)         collapses ~1000 partials → n_groups rows
    → repartition(small) → merge again        second collapse level
    → driver merge of the ≤64×n_groups rest   final GroupedSketch per group

Per-batch partials are the combiner pattern: the groupby-by-source
shuffle never sees raw rows, only O(KB) mergeable sketches
(HistogramSketch quantiles + count-min token frequencies), so a 70%-hot
``web`` source costs the same as a cold one — sketch size is
independent of group size.  This mirrors how the reference keeps
``arr_hashes`` bounded per array (schema.rs:86) — except our state is
bounded per *group*, not per row, and merges associatively.

Permissiveness parity: a group with no reference stats PASSES
(mirroring the reference's ``tagged_allow`` — unknown enum tags are
accepted, schema.rs:658).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..errors import R
from ..kernels import as_array, flatten_with_parents
from ..state.sketches import GroupedSketch

PARTIAL_SCHEMA = pa.schema(
    [("group", pa.string()), ("sketch", pa.binary())]
)


def _make_partials_fn(drift):
    group_col, value_col, token_col = drift.group_by, drift.column, drift.token_column

    def partials(batch: pa.Table) -> pa.Table:
        if (group_col not in batch.column_names
                or value_col not in batch.column_names):
            # heterogeneous inputs: this file lacks the drift columns
            return pa.table({"group": pa.array([], type=pa.string()),
                             "sketch": pa.array([], type=pa.binary())})
        gcol = batch.column(group_col)
        gcol = as_array(gcol)
        enc = pc.dictionary_encode(gcol)
        codes = enc.indices.to_numpy(zero_copy_only=False)
        groups = enc.dictionary.to_pylist()
        vals = pc.cast(batch.column(value_col), pa.float64())
        vals_np = (as_array(vals)
                   ).to_numpy(zero_copy_only=False)
        tok_np = parents = None
        if token_col and token_col in batch.column_names:
            values, parents, _ = flatten_with_parents(batch.column(token_col))
            tok_np = values.to_numpy(zero_copy_only=False)
        out_groups, out_blobs = [], []
        for code, gname in enumerate(groups):
            if gname is None:
                continue
            mask = codes == code
            g = GroupedSketch(quantile_sketch=getattr(
                drift, "quantile_sketch", "histogram"))
            g.hist.add(vals_np[mask])
            g.rows = int(mask.sum())
            if tok_np is not None:
                g.tokens.add(tok_np[mask[parents]])
            out_groups.append(str(gname))
            out_blobs.append(g.to_bytes())
        return pa.table({"group": pa.array(out_groups, type=pa.string()),
                         "sketch": pa.array(out_blobs, type=pa.binary())})

    return partials


def _merge_block(batch: pa.Table) -> pa.Table:
    merged: dict[str, GroupedSketch] = {}
    for gname, blob in zip(batch.column("group").to_pylist(),
                           batch.column("sketch").to_pylist()):
        g = GroupedSketch.from_bytes(blob)
        if gname in merged:
            merged[gname].merge(g)
        else:
            merged[gname] = g
    return pa.table({
        "group": pa.array(list(merged.keys()), type=pa.string()),
        "sketch": pa.array([g.to_bytes() for g in merged.values()], type=pa.binary()),
    })


def compute_group_sketches(ds, drift) -> dict[str, GroupedSketch]:
    """Per-group GroupedSketch over the whole dataset (streaming)."""
    cols = [c for c in {drift.group_by, drift.column, drift.token_column} if c]
    # project to only the sketched columns: an unprojected caller must
    # not stream every column through the sketch stage
    if all(c in ds.schema().names for c in cols):
        ds = ds.select_columns(cols)
    partials = ds.map_batches(
        _make_partials_fn(drift), batch_format="pyarrow", zero_copy_batch=True
    )
    collapsed = partials.map_batches(_merge_block, batch_format="pyarrow",
                                     batch_size=4096)
    # second collapse level bounds the driver merge at 64×n_groups rows
    collapsed = collapsed.repartition(8).map_batches(
        _merge_block, batch_format="pyarrow", batch_size=None)
    final: dict[str, GroupedSketch] = {}
    for b in collapsed.iter_batches(batch_format="pyarrow"):
        for gname, blob in zip(b.column("group").to_pylist(),
                               b.column("sketch").to_pylist()):
            g = GroupedSketch.from_bytes(blob)
            if gname in final:
                final[gname].merge(g)
            else:
                final[gname] = g
    return final


# ---------------------------------------------------------------------------
# reference-epoch stats (FIXTURES T3) and the comparison


def stats_table(sketches: dict[str, GroupedSketch], drift) -> pa.Table:
    """Serialize measured sketches into the T3 reference_stats schema."""
    qs = list(drift.quantiles)
    groups = sorted(sketches)
    quant = [[float(x) for x in sketches[g].hist.quantile(qs)] for g in groups]
    topk = [
        [{"token": t, "freq": f} for t, f in sketches[g].tokens.topk(drift.topk)]
        for g in groups
    ]
    rows = [sketches[g].rows for g in groups]
    return pa.table(
        {
            "source": pa.array(groups, type=pa.string()),
            "n_tok_quantiles": pa.array(quant, type=pa.list_(pa.float64())),
            "token_freq_topk": pa.array(
                topk, type=pa.list_(pa.struct([("token", pa.int32()),
                                               ("freq", pa.float64())]))),
            "row_count": pa.array(rows, type=pa.int64()),
        }
    )


def make_reference_stats(source, drift, out_path: str | None = None) -> pa.Table:
    """Compute reference-epoch stats from a (clean) dataset or path."""
    import ray.data as rd

    if isinstance(source, (str, list, tuple)):
        from ..sources.parquet import list_input_files

        cols = [c for c in {drift.group_by, drift.column, drift.token_column} if c]
        source = rd.read_parquet(list_input_files(source), columns=cols)
    t = stats_table(compute_group_sketches(source, drift), drift)
    if out_path:
        import pyarrow.parquet as pq

        pq.write_table(t, out_path)
    return t


def drift_violations(ds, drift, reference) -> pa.Table:
    """Compare measured per-group sketches vs reference stats.

    * quantile check: relative error per requested quantile vs the
      reference's stored grid; any breach > max_rel_err (and above the
      absolute noise floor) flags;
    * token-frequency check: L1 distance between the reference top-k
      relative frequencies and the measured estimates for those tokens.
    """
    measured = compute_group_sketches(ds, drift)
    rows = _compare_sketches(measured, drift, reference)
    n = len(rows)
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], type=pa.string()),
            "rule_id": pa.array([R.DRIFT] * n, type=pa.string()),
            "span": pa.array([r["span"] for r in rows], type=pa.string()),
            "message": pa.array([r["message"] for r in rows], type=pa.string()),
            "partition_id": pa.array(np.full(n, -1, dtype=np.int32)),
        }
    )


def _compare_sketches(measured: dict, drift, reference) -> list[dict]:
    """Shared comparison core: measured sketches vs a reference stats
    table (path or pa.Table) -> violation row dicts."""
    import pyarrow.parquet as pq

    if isinstance(reference, str):
        reference = pq.read_table(reference)
    ref = {
        r["source"]: r for r in reference.to_pylist()
    }
    qs = list(drift.quantiles)

    doc, span, msg = [], [], []
    for gname, sk in sorted(measured.items()):
        if gname not in ref:
            continue  # tagged_allow parity: unknown group passes
        if sk.rows < drift.min_rows:
            continue
        rq = np.asarray(ref[gname]["n_tok_quantiles"], dtype=np.float64)
        mq = sk.hist.quantile(qs)
        if len(rq) == len(mq):
            diff = np.abs(mq - rq)
            rel = diff / np.maximum(np.abs(rq), 1.0)
            min_abs = getattr(drift, "min_abs_err", 0.0)
            breaches = [
                (q, float(m), float(r), float(e))
                for q, m, r, e, a in zip(qs, mq, rq, rel, diff)
                if e > drift.max_rel_err and a > min_abs
            ]
            if breaches:
                detail = "; ".join(
                    f"p{int(q * 100)}: measured {m:.1f} vs reference {r:.1f} "
                    f"(rel err {e:.2f})" for q, m, r, e in breaches)
                doc.append(gname)
                span.append(f"{drift.group_by}.{gname}.{drift.column}")
                msg.append(f"distribution drift on {drift.column}: {detail}")
        ks_max = getattr(drift, "ks_max", None)
        if ks_max is not None and len(rq) == len(qs):
            # KS statistic against the reference grid: the measured CDF
            # evaluated at the reference's quantile VALUES should
            # return (approximately) the grid probabilities
            mcdf = sk.hist.cdf(rq)
            ks = float(np.nanmax(np.abs(mcdf - np.asarray(qs))))
            if ks > ks_max:
                doc.append(gname)
                span.append(f"{drift.group_by}.{gname}.{drift.column}")
                msg.append(
                    f"distribution drift on {drift.column}: KS statistic "
                    f"{ks:.3f} vs reference quantile grid exceeds {ks_max}")
        ref_topk = ref[gname].get("token_freq_topk") or []
        if ref_topk and drift.token_column:
            toks = np.array([d["token"] for d in ref_topk], dtype=np.int64)
            rfreq = np.array([d["freq"] for d in ref_topk], dtype=np.float64)
            total = float(sk.tokens.cm.n)
            if total > 0:
                mfreq = sk.tokens.cm.estimate(toks).astype(np.float64) / total
                l1 = float(np.abs(mfreq - rfreq).sum())
                if l1 > drift.topk_l1_max:
                    doc.append(gname)
                    span.append(f"{drift.group_by}.{gname}.{drift.token_column}")
                    msg.append(
                        f"token-frequency drift: L1 distance {l1:.3f} over "
                        f"reference top-{len(toks)} exceeds {drift.topk_l1_max}")
    return [
        {"doc_id": d, "rule_id": R.DRIFT, "span": s, "message": m,
         "partition_id": -1}
        for d, s, m in zip(doc, span, msg)
    ]
