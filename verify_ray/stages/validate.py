"""The narrow per-batch validation stage.

One vectorized pass over the input: every K/S/M/C kernel from the
compiled plan runs over zero-copy Arrow batches inside
``ds.map_batches(validator, batch_format="pyarrow")``.  This is the
distributed analogue of the reference's serde-visitor traversal
(/root/reference/verify/src/serde.rs:241-267) — except one *column
access* replaces a million per-value callbacks.

Stateless by design (the plan is immutable and cloudpickled into the
task closures once), so it runs as cheap elastic Ray tasks, not actors
(actors are reserved for genuinely stateful stages — see drift.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..errors import VIOLATION_SCHEMA
from ..kernels import CompiledPlan

PATH_COL = "path"


def split_by_path(batch: pa.Table,
                  path_to_pid: dict[str, int] | None) -> list[tuple[pa.Table, int]]:
    """Shared per-file lineage split: ``[(sub_batch_without_path, pid)]``.

    A block can merge several input files (small-file case) — each
    file's rows come back as their own sub-batch so lineage stays
    exact.  Batches without a ``path`` column (in-memory datasets) map
    to the single pseudo-partition -2.
    """
    import pyarrow.compute as pc

    if PATH_COL not in batch.column_names or path_to_pid is None:
        if PATH_COL in batch.column_names:
            batch = batch.drop_columns([PATH_COL])
        return [(batch, -2)]
    paths = pc.dictionary_encode(batch.column(PATH_COL).combine_chunks())
    batch = batch.drop_columns([PATH_COL])
    dict_vals = paths.dictionary.to_pylist() if len(paths) else []
    if len(dict_vals) <= 1:
        pid = path_to_pid.get(dict_vals[0], -2) if dict_vals else -2
        return [(batch, pid)]
    indices = paths.indices
    return [(batch.filter(pc.equal(indices, code)),
             path_to_pid.get(pathval, -2))
            for code, pathval in enumerate(dict_vals)]


def stamp_partition(v: pa.Table, pid: int) -> pa.Table:
    part = pa.array(np.full(v.num_rows, pid, dtype=np.int32))
    return v.append_column("partition_id", part)


def make_batch_validator(plan: CompiledPlan, path_to_pid: dict[str, int] | None = None):
    """Build the map_batches fn: Arrow batch in -> violation rows out.

    If the batch carries a ``path`` column (read_with_lineage), each
    violation row is stamped with its partition_id; otherwise -2
    (unknown partition — in-memory datasets).
    """

    def validate(batch: pa.Table) -> pa.Table:
        parts = [stamp_partition(plan.validate_batch(sub), pid)
                 for sub, pid in split_by_path(batch, path_to_pid)]
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)

    return validate


def empty_violations_table() -> pa.Table:
    return VIOLATION_SCHEMA.empty_table()
