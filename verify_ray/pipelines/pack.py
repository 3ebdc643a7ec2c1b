"""Sequence packing: concatenate tokenized documents into fixed-length
training examples (the standard LLM pretraining data layout).

Semantics (deterministic, order-defined): within each group
(``source``), documents are ordered by ``doc_id``, their token streams
concatenated, and the stream split into consecutive ``seq_len``-token
examples; the final partial example is kept (callers can filter
``n_tokens < seq_len`` for drop-remainder).  Because the layout is a
pure function of (group, doc order, seq_len), the exact example
boundaries and per-example token checksums are reproducible in SQL —
the driver oracle checks them.

Scale shape: rows are hash-exchanged by group (only (group, doc_id,
tokens) move), and each merge task lays out its groups' streams in one
vectorized pass (sort → flatten → integer divide).  Partitioning
assumption: one group's token stream fits a merge task.  For groups
beyond that, use the two-phase variant: (1) per-doc token counts →
per-group prefix offsets (a tiny groupby), (2) a second map pass tags
every doc with its global token offset, so each task can emit its
docs' example spans independently — no single-task group materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pack_sequences(seqs_ds, seq_len: int = 512, group_col: str = "source",
                   id_col: str = "doc_id", token_col: str = "tokens",
                   num_buckets: int | None = None) -> pd.DataFrame:
    """(group, example_id, n_tokens, token_sum) per packed example."""
    import ray

    from ..stages.exchange import grouped_exchange

    if num_buckets is None:
        num_buckets = max(8, int(ray.cluster_resources().get("CPU", 8)))

    def add_bucket(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(g.astype(object))
        return t.append_column(
            "bucket", pa.array((h % np.uint64(num_buckets)).astype(np.int64)))

    def pack_group(t: pa.Table) -> pa.Table:
        # one vectorized layout pass for ALL groups in the bucket
        idx = pc.sort_indices(
            t, sort_keys=[(group_col, "ascending"), (id_col, "ascending")])
        t = t.take(idx)
        groups = t.column(group_col).to_numpy(zero_copy_only=False)
        toks = t.column(token_col)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        # null token lists contribute zero tokens (flatten skips them)
        lengths = pc.fill_null(pc.list_value_length(toks), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # per-row flat-stream starts; within-group position = flat pos
        # minus the flat start of the group's FIRST row (cumsum-based,
        # so rows/groups with zero tokens never shift the indexing)
        row_starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
        row_group_change = np.concatenate(
            [[True], groups[1:] != groups[:-1]])
        grp_id_per_row = np.cumsum(row_group_change) - 1
        grp_first_start = row_starts[np.flatnonzero(row_group_change)]
        tok_row = np.repeat(np.arange(len(groups)), lengths)
        pos = np.arange(len(flat), dtype=np.int64)
        within = pos - grp_first_start[grp_id_per_row[tok_row]]
        tok_grp = grp_id_per_row[tok_row]
        ex = within // seq_len
        if len(flat) == 0:
            return pa.table({
                group_col: pa.array([], type=t.schema.field(group_col).type),
                "example_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "token_sum": pa.array([], type=pa.int64()),
            })
        # examples are contiguous runs of (grp, ex): reduceat aggregates
        change = np.concatenate([[True], (tok_grp[1:] != tok_grp[:-1])
                                 | (ex[1:] != ex[:-1])])
        starts = np.flatnonzero(change)
        n_tok = np.diff(np.append(starts, len(flat)))
        sums = np.add.reduceat(flat.astype(np.int64), starts)
        grp_names = groups[row_group_change]
        return pa.table({
            group_col: pa.array(grp_names[tok_grp[starts]]),
            "example_id": pa.array(ex[starts]),
            "n_tokens": pa.array(n_tok.astype(np.int64)),
            "token_sum": pa.array(sums),
        })

    bucketed = (seqs_ds.select_columns([group_col, id_col, token_col])
                .map_batches(add_bucket, batch_format="pyarrow"))
    out = grouped_exchange(bucketed, "bucket", num_buckets, pack_group)
    if out is None:
        return pd.DataFrame({group_col: [], "example_id": [],
                             "n_tokens": [], "token_sum": []})
    return (out.to_pandas()
            .sort_values([group_col, "example_id"]).reset_index(drop=True))
