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
