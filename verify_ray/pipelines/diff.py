"""Dataset version diff — the incremental-ingest primitive: given two
epochs of a corpus (reference/previous vs current), report every
document that was ``added``, ``removed``, or ``changed`` (same id,
different content).  A validation engine that runs per-epoch (the
north rule's resumable ``run()``) needs exactly this to scope
revalidation to the delta instead of the full 100 TB.

Scale shape: each side is projected to ``(id, md5(content))`` in one
streaming pass (16-byte content fingerprints — the shared DuckDB-
parity kernel ``functions.hashing.md5_hex``), tagged with its epoch,
and co-located by id through the sort-free hash exchange
(``stages.exchange``, keyed on ``md5_u64le(id)``).  Each merge task
resolves its ids independently with one vectorized pandas outer
merge; only DIFF rows (added/removed/changed) leave the tasks, so the
driver sees output-sized data — an unchanged 100 TB corpus produces
zero rows.  Contract: ids are unique within each epoch (duplicate
detection is W1's job, not this operator's).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_hex, md5_u64le


def _fingerprint(ds, id_col: str, text_col: str, epoch: int):
    def fp(b: pa.Table) -> pa.Table:
        ids = pc.cast(b[id_col], pa.string())
        sub = pa.table({"id": ids, "h": md5_hex(b[text_col])})
        sub = sub.filter(pc.is_valid(sub["id"]))
        if sub.num_rows == 0:
            bk = np.empty(0, dtype=np.uint64)
        else:
            bk = md5_u64le(sub["id"])
        return (sub.append_column("epoch",
                                  pa.array([epoch] * sub.num_rows,
                                           type=pa.int8()))
                .append_column("bk", pa.array(bk, type=pa.uint64())))

    return ds.map_batches(fp, batch_format="pyarrow")


def dataset_diff(cur_ds, ref_ds, id_col: str = "doc_id",
                 text_col: str = "text",
                 num_buckets: int = 64) -> pd.DataFrame:
    """``(doc_id, status)`` for every id whose content differs between
    epochs; status ∈ {'added', 'removed', 'changed'}.  Unchanged ids
    emit nothing."""
    from ..stages.exchange import grouped_exchange

    cur = _fingerprint(cur_ds, id_col, text_col, 1)
    ref = _fingerprint(ref_ds, id_col, text_col, 0)
    both = cur.union(ref)

    def resolve(t: pa.Table) -> pa.Table:
        df = t.select(["id", "h", "epoch"]).to_pandas()
        c = df[df.epoch == 1]
        r = df[df.epoch == 0]
        m = c.merge(r, on="id", how="outer", suffixes=("_c", "_r"))
        status = np.where(
            m.h_r.isna(), "added",
            np.where(m.h_c.isna(), "removed",
                     np.where(m.h_c != m.h_r, "changed", "")))
        keep = status != ""
        return pa.table({
            "doc_id": pa.array(m.id[keep].to_numpy(), type=pa.string()),
            "status": pa.array(status[keep], type=pa.string()),
        })

    out = grouped_exchange(both, "bk", num_buckets, resolve,
                           drop_bucket=False)
    if out is None or not out.num_rows:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=object),
                             "status": pd.Series([], dtype=object)})
    return (out.to_pandas().sort_values(["doc_id", "status"])
            .reset_index(drop=True))


def table_checksum(ds, cols: list[str], group_col: str | None = None
                   ) -> pd.DataFrame:
    """Order-insensitive content CHECKSUM of a table (optionally per
    group) — the anti-entropy / replication-audit primitive: two
    copies of a corpus on different clusters compare one small
    checksum table instead of shipping data; a mismatch scopes the
    repair to the differing group (then ``dataset_diff`` pinpoints
    rows).

    Contract (restated verbatim in SQL so oracles hash-match):
    row string = ``"\\x1f"``-joined string casts of ``cols`` with a
    per-column null flag (``'1'`` + '' for null — no sentinel
    collision); per-row term = ``md5_number_upper(row_string) %
    2^40``; checksum = ``SUM(term) % 2^61`` — term sums stay exact in
    int64/HUGEINT up to ~2·10^6 rows per partial and the final
    modulus keeps the result a BIGINT.  Order-insensitive because SUM
    commutes; multiplicity-sensitive (a duplicated row changes the
    sum).

    Scale shape: one streaming pass; each batch reduces to (group,
    partial_sum, n) — group-cardinality-sized partials merged on the
    driver (enum-sized groups; route through grouped_exchange above
    that, as _merge_partials does).
    """
    MOD_TERM = np.uint64(1 << 40)
    MOD_SUM = (1 << 61)

    def partial(b: pa.Table) -> pa.Table:
        arr = None
        for c in cols:
            col = pc.cast(b[c], pa.string())
            flag = pc.if_else(pc.is_null(col), pa.scalar("1"),
                              pa.scalar("0"))
            s = pc.binary_join_element_wise(
                flag, pc.fill_null(col, ""), "\x1e")
            arr = s if arr is None else pc.binary_join_element_wise(
                arr, s, "\x1f")
        terms = (md5_u64le(arr) % MOD_TERM).astype(np.int64)
        if group_col is None:
            gu = np.array([""], dtype=object)
            gc = np.zeros(len(terms), dtype=np.int64)
        else:
            # validity-flag encoding: a null group is its own group
            # (SQL GROUP BY) and None never reaches np.unique's sort
            gs = pc.cast(b[group_col], pa.string())
            flag = pc.if_else(pc.is_null(gs), pa.scalar("1"),
                              pa.scalar("0"))
            enc = pc.binary_join_element_wise(
                flag, pc.fill_null(gs, ""), "")
            garr = enc.to_numpy(zero_copy_only=False)
            gu, gc = np.unique(garr.astype(object), return_inverse=True)
        sums = np.zeros(len(gu), dtype=np.int64)
        np.add.at(sums, gc, terms)
        ns = np.bincount(gc, minlength=len(gu)).astype(np.int64)
        gcol = (pa.array([""], type=pa.string()) if group_col is None
                else pa.array(gu, type=pa.string()))
        return pa.table({"g": gcol,
                         "s": pa.array(sums), "n": pa.array(ns)})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({"g": pd.Series(dtype=object),
                             "n_rows": pd.Series(dtype="int64"),
                             "checksum": pd.Series(dtype="int64")})
    # partial sums are < 2^56 each; >128 partials would overflow an
    # int64 driver sum — merge as Python ints (exact), then reduce
    parts["s"] = parts["s"].astype(object)
    agg = parts.groupby("g", as_index=False).agg(
        n_rows=("n", "sum"), checksum=("s", "sum"))
    agg["checksum"] = (agg["checksum"] % MOD_SUM).astype("int64")
    agg["n_rows"] = agg["n_rows"].astype("int64")
    if group_col is not None:
        # strip the validity flag; '1' marks the null group
        agg["g"] = [None if s[0] == "1" else s[1:] for s in agg["g"]]
        out = (agg.rename(columns={"g": group_col})
               .sort_values(group_col, na_position="last")
               .reset_index(drop=True))
    else:
        out = agg.drop(columns=["g"]).reset_index(drop=True)
    return out
