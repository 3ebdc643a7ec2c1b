"""Distributed SQL set operations over datasets: EXCEPT, INTERSECT,
and UNION with DISTINCT semantics over a column tuple.

The training-data uses: "which (key...) combinations appeared this
epoch but not last" (EXCEPT — the delta the incremental revalidation
in pipelines/diff.py acts on at row granularity, here at distinct-key
granularity), "which benchmark keys also occur in the corpus"
(INTERSECT — membership overlap without the broadcast bound of
contamination.decontaminate), and distinct-union manifest merges.

Scale shape: each input block first collapses to its DISTINCT key
tuples (map-side ``np.unique`` — multiplicity never leaves the block),
tagged with its side; the surviving distinct rows route through ONE
hash exchange keyed on the tuple (each distinct tuple meets in exactly
one bucket); each bucket resolves side membership with one lexsort
pass and emits the qualifying tuples.  Nothing row-count-sized is
shuffled; the exchange carries per-block distinct tuples only, and the
result stays in the object store as a Dataset.

Null policy: rows with a NULL in any set-op column are dropped on both
sides (documented deviation from SQL's NULL-equality in set ops — the
repo's grouped operators refuse NULL/sentinel ambiguity the same way;
oracles filter ``IS NOT NULL`` identically).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import md5_u64le
from ..kernels import as_array
from ..stages.exchange import grouped_exchange_ds

_SEP = "\x1f"


def _tagged(ds, cols: list[str], side: int):
    """Per-block distinct key tuples + side flag + exchange bucket."""

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.is_valid(b[cols[0]])
        for c in cols[1:]:
            mask = pc.and_(mask, pc.is_valid(b[c]))
        b = b.filter(mask)
        key = pc.cast(as_array(b[cols[0]]), pa.string())
        for c in cols[1:]:
            key = pc.binary_join_element_wise(
                key, pc.cast(as_array(b[c]), pa.string()), _SEP)
        _, idx = np.unique(key.to_numpy(zero_copy_only=False),
                           return_index=True)
        take = pa.array(np.sort(idx))
        key_u = key.take(take)
        out = {"__key": key_u,
               "__b": pa.array(md5_u64le(key_u), type=pa.uint64()),
               "__side": pa.array(
                   np.full(len(key_u), side, dtype=np.int8))}
        for c in cols:
            out[c] = as_array(b[c]).take(take)
        return pa.table(out)

    return ds.map_batches(partial, batch_format="pyarrow")


def distinct_setop(ds_a, ds_b, cols: list[str], op: str,
                   num_buckets: int = 64):
    """``SELECT DISTINCT cols FROM a  <OP>  SELECT DISTINCT cols FROM
    b`` as a Dataset, for ``op`` in {'except', 'intersect'}.

    EXCEPT keeps tuples present in ``ds_a`` and absent from ``ds_b``;
    INTERSECT keeps tuples present in both.  Output rows take their
    column VALUES from side A (both sides agree on the string form by
    construction; A's Arrow types win).
    """
    if op not in ("except", "intersect"):
        raise ValueError(f"op must be 'except' or 'intersect', got {op!r}")

    schema = ds_a.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(c, types[c]) for c in cols])

    def resolve(t: pa.Table) -> pa.Table:
        karr = t.column("__key").to_numpy(zero_copy_only=False)
        sides = t.column("__side").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(karr, return_inverse=True)
        in_a = np.zeros(len(uniq), dtype=bool)
        in_b = np.zeros(len(uniq), dtype=bool)
        in_a[inv[sides == 0]] = True
        in_b[inv[sides == 1]] = True
        keep_key = in_a & (in_b if op == "intersect" else ~in_b)
        if not keep_key.any():
            return None
        # one representative A-side row per surviving tuple
        a_rows = np.flatnonzero(sides == 0)
        first_a = np.zeros(len(uniq), dtype=np.int64)
        # reversed so the smallest row index wins
        first_a[inv[a_rows[::-1]]] = a_rows[::-1]
        sel = pa.array(first_a[keep_key])
        return pa.table({c: t.column(c).take(sel)
                         for c in cols}).cast(out_schema)

    both = _tagged(ds_a.select_columns(cols), cols, 0).union(
        _tagged(ds_b.select_columns(cols), cols, 1))
    return grouped_exchange_ds(both, "__b", num_buckets, resolve,
                               empty_schema=out_schema,
                               drop_bucket=True)


def distinct_union(ds_a, ds_b, cols: list[str], num_buckets: int = 64):
    """``SELECT DISTINCT cols FROM a UNION SELECT DISTINCT cols FROM
    b`` as a Dataset (SQL UNION = distinct union).  Same exchange
    shape as ``distinct_setop``; ties between sides resolve to the
    A-side row's values (B-side values only appear for B-only
    tuples)."""
    schema = ds_a.schema()
    types = dict(zip(schema.names, schema.types))
    out_schema = pa.schema([(c, types[c]) for c in cols])

    def resolve(t: pa.Table) -> pa.Table:
        karr = t.column("__key").to_numpy(zero_copy_only=False)
        sides = t.column("__side").to_numpy(zero_copy_only=False)
        # lexsort (side, row) within key: side-A representative wins
        order = np.lexsort((np.arange(len(karr)), sides, karr))
        ks = karr[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        sel = pa.array(np.sort(order[new]))
        return pa.table({c: t.column(c).take(sel)
                         for c in cols}).cast(out_schema)

    both = _tagged(ds_a.select_columns(cols), cols, 0).union(
        _tagged(ds_b.select_columns(cols), cols, 1))
    return grouped_exchange_ds(both, "__b", num_buckets, resolve,
                               empty_schema=out_schema,
                               drop_bucket=True)
