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
                 num_buckets: int = 64, as_dataset: bool = False):
    """``(doc_id, status)`` for every id whose content differs between
    epochs; status ∈ {'added', 'removed', 'changed'}.  Unchanged ids
    emit nothing.

    ``as_dataset=True`` (VERDICT r4 #1) keeps the delta in the object
    store as an UNSORTED Dataset — at scale a 20%-changed epoch's delta
    is corpus-sized, so the default driver frame (sorted, for
    output-sized deltas and the SQL-oracle ordering contract) must not
    be the only form."""
    from ..stages.exchange import grouped_exchange, grouped_exchange_ds

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

    if as_dataset:
        out_schema = pa.schema([("doc_id", pa.string()),
                                ("status", pa.string())])
        return grouped_exchange_ds(both, "bk", num_buckets, resolve,
                                   empty_schema=out_schema,
                                   drop_bucket=False)
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


def three_way_merge(base_ds, ours_ds, theirs_ds, key_col: str,
                    value_cols: list[str], num_buckets: int = 64):
    """Git-style THREE-WAY merge of two divergent snapshots against a
    common base — the branch-reconciliation primitive (two teams
    curate a corpus from the same snapshot; merge both edit sets,
    surfacing true conflicts instead of last-writer-wins).

    Per key (unique within each input, the snapshot contract), a side
    "changed" iff its content hash (md5 of the null-flagged
    ``\\x1f``-joined ``value_cols``, the ``table_checksum`` row-string
    convention) differs from base — absence counts as a delete.
    Resolution: neither changed → ``base``; one side changed →
    ``ours``/``theirs`` (its row wins; a winning delete emits
    nothing); both changed identically (including both-deleted) →
    ``both``; both changed differently → ``conflict`` (NULL values —
    both versions are one hash lookup away, this operator's job is to
    FIND them).  Adds on one side → that side; on both → ``both`` or
    ``conflict`` by the same equality rule.

    Output: Dataset of ``key_col`` (original type) + ``value_cols`` of
    the winning side + ``status``.  Scale shape: all three inputs tag
    (src, content-hash, payload) in one streaming pass and co-locate
    through ONE hash exchange on the key; each bucket resolves its
    keys independently (outer pandas merge over bucket-sized frames,
    ``dataset_diff``'s idiom), and only surviving rows leave the task
    — output-sized, nothing driver-resident.
    """
    from ..stages.exchange import grouped_exchange_ds

    schema = base_ds.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(key_col, types[key_col])]
                           + [(c, types[c]) for c in value_cols]
                           + [("status", pa.string())])

    def tag(src: int):
        def f(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b[key_col]))
            arr = None
            for c in value_cols:
                col = pc.cast(b[c], pa.string())
                flag = pc.if_else(pc.is_null(col), pa.scalar("1"),
                                  pa.scalar("0"))
                s = pc.binary_join_element_wise(
                    flag, pc.fill_null(col, ""), "\x1e")
                arr = s if arr is None else pc.binary_join_element_wise(
                    arr, s, "\x1f")
            ids = pc.cast(b[key_col], pa.string())
            cols = {"__b": pa.array(md5_u64le(ids), type=pa.uint64()),
                    "__id": ids, "__h": md5_hex(arr),
                    "__src": pa.array(
                        np.full(b.num_rows, np.int8(src))),
                    key_col: b[key_col]}
            for c in value_cols:
                cols[c] = b[c]
            return pa.table(cols)
        return f

    tagged = (base_ds.map_batches(tag(0), batch_format="pyarrow")
              .union(ours_ds.map_batches(tag(1), batch_format="pyarrow"))
              .union(theirs_ds.map_batches(tag(2),
                                           batch_format="pyarrow")))

    def resolve(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "id": t.column("__id").to_numpy(zero_copy_only=False),
            "h": t.column("__h").to_numpy(zero_copy_only=False),
            "src": t.column("__src").to_numpy(zero_copy_only=False),
            "row": np.arange(t.num_rows, dtype=np.int64)})
        b = df[df.src == 0][["id", "h", "row"]]
        o = df[df.src == 1][["id", "h", "row"]]
        th = df[df.src == 2][["id", "h", "row"]]
        m = (b.merge(o, on="id", how="outer", suffixes=("_b", "_o"))
             .merge(th.rename(columns={"h": "h_t", "row": "row_t"}),
                    on="id", how="outer"))
        hb = m.h_b.where(m.h_b.notna(), "\x00DEL")
        ho = m.h_o.where(m.h_o.notna(), "\x00DEL")
        ht = m.h_t.where(m.h_t.notna(), "\x00DEL")
        o_chg = (ho != hb).to_numpy()
        t_chg = (ht != hb).to_numpy()
        same = (ho == ht).to_numpy()
        o_del = m.h_o.isna().to_numpy()
        t_del = m.h_t.isna().to_numpy()
        status = np.where(
            ~o_chg & ~t_chg, "base",
            np.where(o_chg & ~t_chg, "ours",
                     np.where(~o_chg & t_chg, "theirs",
                              np.where(same, "both", "conflict"))))
        # winner's physical row (−1 = winning delete → no output row)
        row_b = m.row_b.fillna(-1).to_numpy(np.int64)
        row_o = m.row_o.fillna(-1).to_numpy(np.int64)
        row_t = m.row_t.fillna(-1).to_numpy(np.int64)
        win = np.select(
            [status == "base", status == "ours", status == "theirs",
             status == "both"],
            [row_b, row_o, row_t, row_o], default=-1)
        # conflicts always have >=1 physical row (both-deleted is
        # 'both'); key/type comes from it, values go NULL
        rep = np.where(row_o >= 0, row_o,
                       np.where(row_t >= 0, row_t, row_b))
        is_conf = status == "conflict"
        keep = (win >= 0) | is_conf
        # 'both'-status deletes: row_o = -1 and win = -1 -> dropped
        win, rep, status = win[keep], rep[keep], status[keep]
        is_conf = is_conf[keep]
        # conflict rows point at a representative row for the KEY but
        # null out the values (a -1 take index would be invalid)
        safe = pa.array(np.where(is_conf, rep, win))
        cols = {key_col: t.column(key_col).take(safe)}
        conf_mask = pa.array(is_conf)
        for c in value_cols:
            v = t.column(c).take(safe)
            cols[c] = pc.if_else(conf_mask,
                                 pa.nulls(len(status), types[c]), v)
        cols["status"] = pa.array(status.astype(object),
                                  type=pa.string())
        return pa.table(cols).cast(out_schema)

    return grouped_exchange_ds(tagged, "__b", num_buckets, resolve,
                               empty_schema=out_schema)


def changed_columns(cur_ds, ref_ds, id_col: str, value_cols: list[str],
                    num_buckets: int = 64):
    """COLUMN-level dataset diff: for every id present in BOTH epochs,
    one output row per value column whose content changed — the CDC
    audit that tells you *what* drifted, not just which rows
    (``dataset_diff`` scopes rows; this scopes columns, e.g. "the
    re-crawl only touched `lang`, revalidate language rules only").

    Same one-exchange shape as ``dataset_diff``: each side projects to
    (id, per-column md5 fingerprints) in one streaming pass — k
    16-byte hashes per row, never the values — co-locates by id hash,
    and each bucket compares column-vectorized (null-flagged strings:
    null vs '' cannot collide, null==null is unchanged).  Ids unique
    per epoch (snapshot contract); added/removed ids are
    ``dataset_diff``'s business and emit nothing here.  Returns a
    Dataset of ``(doc_id, column)`` rows, output-sized.
    """
    from ..stages.exchange import grouped_exchange_ds

    out_schema = pa.schema([("doc_id", pa.string()),
                            ("column", pa.string())])

    def tag(epoch: int):
        def f(b: pa.Table) -> pa.Table:
            b = b.filter(pc.is_valid(b[id_col]))
            ids = pc.cast(b[id_col], pa.string())
            cols = {"__b": pa.array(md5_u64le(ids), type=pa.uint64()),
                    "__id": ids,
                    "__e": pa.array(
                        np.full(b.num_rows, np.int8(epoch)))}
            for c in value_cols:
                s = pc.cast(b[c], pa.string())
                flag = pc.if_else(pc.is_null(s), pa.scalar("1"),
                                  pa.scalar("0"))
                cols[f"__h_{c}"] = md5_hex(
                    pc.binary_join_element_wise(
                        flag, pc.fill_null(s, ""), "\x1e"))
            return pa.table(cols)
        return f

    tagged = (cur_ds.map_batches(tag(1), batch_format="pyarrow")
              .union(ref_ds.map_batches(tag(0), batch_format="pyarrow")))

    def resolve(t: pa.Table) -> pa.Table:
        e = t.column("__e").to_numpy(zero_copy_only=False)
        ids = t.column("__id").to_numpy(zero_copy_only=False)
        cm = np.flatnonzero(e == 1)
        rm = np.flatnonzero(e == 0)
        cur_ids, ref_ids = ids[cm], ids[rm]
        # intersect on id (both sides unique): positions via searchsorted
        co = np.argsort(cur_ids, kind="stable")
        ro = np.argsort(ref_ids, kind="stable")
        common, ci, ri = np.intersect1d(cur_ids[co], ref_ids[ro],
                                        assume_unique=True,
                                        return_indices=True)
        if not len(common):
            return None
        cidx, ridx = cm[co[ci]], rm[ro[ri]]
        out_ids, out_cols = [], []
        for c in value_cols:
            h = t.column(f"__h_{c}").to_numpy(zero_copy_only=False)
            diff = h[cidx] != h[ridx]
            if diff.any():
                out_ids.append(common[diff])
                out_cols.append(np.full(int(diff.sum()), c,
                                        dtype=object))
        if not out_ids:
            return None
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_ids),
                               type=pa.string()),
            "column": pa.array(np.concatenate(out_cols),
                               type=pa.string())})

    return grouped_exchange_ds(tagged, "__b", num_buckets, resolve,
                               empty_schema=out_schema)
