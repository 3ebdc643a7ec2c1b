"""The public driver API — the analogue of the reference's
``Verifier::verify_value`` entry point
(/root/reference/verify/src/impls/schemars/schema.rs:18-34, trait
def lib.rs:191-206), generalized from "one value" to "one Dataset":

    report = validate("/data/sequences", spec, manifests={...})

Pipeline (SURVEY §3.4), all streaming with backpressure:

    footer scan (schema + row counts; no data pages)     driver, cheap
      → read_parquet(columns=<referenced only>)          prune at read
      → map_batches(validator)        narrow kernels + broadcast ref rules
      → groupby(key) over per-batch partial counts       W1 uniqueness
      → union → violations; verdicts from counts         W4/W5

``validate`` materializes the (small) violation set for interactive /
test use.  For 100 TB runs use ``verify_ray.run`` which streams
violations straight to partitioned Parquet with per-partition
checkpoints and never collects them on the driver.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field as dc_field

import numpy as np
import pandas as pd
import pyarrow as pa

from .errors import VIOLATION_SCHEMA, conform_violations
from .kernels import CompiledPlan
from .spec import ConstraintSpec
from .sources.parquet import (list_input_files, partition_map,
                              scan_inputs, schema_fingerprint, union_schema)
from .stages.referential import rule_for_ref_check
from .stages.unique import unique_violations
from .stages.validate import make_batch_validator


@dataclass
class ValidationReport:
    """W4/W5: violations as data + per-partition verdicts.

    A partition passes iff it has zero violations — the mirror of
    ``Errors::is_empty`` (reference errors.rs:354-356).  Global rules
    (uniqueness, referential aggregates, drift) carry partition_id -1
    and affect the run-level verdict, not per-partition ones.
    """

    violations: pa.Table
    verdicts: pd.DataFrame
    summary: dict = dc_field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return self.violations.num_rows == 0

    def rule_counts(self) -> dict[str, int]:
        if self.violations.num_rows == 0:
            return {}
        vc = self.violations.column("rule_id").to_pandas().value_counts()
        return {str(k): int(v) for k, v in vc.items()}

    def format_errors(self, limit: int = 100) -> list[str]:
        """Render violations the way the reference prints them —
        ``(span) message`` with the doc id prefixed (the reference's
        loop: ``println!("({span}) {err}")``,
        /root/reference/verify/examples/schemars_json.rs:63-71)."""
        out = []
        for r in self.violations.slice(0, limit).to_pylist():
            prefix = f"{r['doc_id']}: " if r["doc_id"] else ""
            out.append(f"{prefix}({r['span']}) {r['message']}")
        return out


def _as_plan(spec_or_plan) -> CompiledPlan:
    if isinstance(spec_or_plan, ConstraintSpec):
        return spec_or_plan.compile()
    if isinstance(spec_or_plan, dict):
        return ConstraintSpec.from_dict(spec_or_plan).compile()
    return spec_or_plan


def build_violations_dataset(ds, plan: CompiledPlan, manifests=None,
                             path_to_pid=None, batch_size=None,
                             file_source: bool = False):
    """Lazy Dataset of narrow-pass violation rows for ``ds``.

    Uniqueness: for in-memory sources it joins the DAG here (Dataset
    groupby path); for file sources the caller runs the fast hash
    exchange over ONLY the key column afterwards (see
    stages/unique.unique_violations_from_files)."""
    rules = list(plan.row_rules)
    for rc in plan.ref_checks:
        rules.append(rule_for_ref_check(rc, manifests))
    narrow_plan = CompiledPlan(
        **{**plan.__dict__, "row_rules": rules}
    )
    validator = make_batch_validator(narrow_plan, path_to_pid)
    kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    violations = ds.map_batches(validator, **kwargs)
    if not file_source:
        # in-memory source: uniqueness via the Dataset groupby path
        for col in plan.unique_columns:
            violations = violations.union(unique_violations(ds, col))
    return violations


def validate(source, spec_or_plan, manifests=None, batch_size=None,
             drift_reference=None) -> ValidationReport:
    """Validate Parquet files (path/dir/list) or a ray Dataset.

    Returns a materialized report — use only when the violation volume
    fits in driver memory (tests, interactive exploration, small runs).
    """
    import ray

    plan = _as_plan(spec_or_plan)

    schema_viols: list[tuple[str, str, str, int]] = []
    path_to_pid = None
    row_counts: dict[int, int] = {}
    if isinstance(source, (str, list, tuple)):
        files = list_input_files(source)
        if not files:
            raise FileNotFoundError(f"no parquet files under {source!r}")
        path_to_pid = partition_map(files)
        row_counts, schemas = scan_inputs(files)
        seen: dict[int, list[int]] = {}
        for pid, sch in schemas.items():
            seen.setdefault(schema_fingerprint(sch), []).append(pid)
        for pids in seen.values():
            for rid, span, msg in plan.schema_violations(schemas[pids[0]]):
                for pid in pids:
                    schema_viols.append((rid, span, msg, pid))
        usch = union_schema(schemas)
        pat_rules = plan.pattern_column_rules(usch)
        cols = [c for c in plan.referenced_columns if c in usch.names]
        cols += sorted({r.column for r in pat_rules} - set(cols))
        from .sources.parquet import read_projected

        ds = read_projected(files, schemas, cols)
        file_source = True
    else:
        # In-memory Dataset source: the violations DAG consumes the input
        # several times (narrow pass + per-column uniqueness).  Without a
        # path source each consumer would RE-EXECUTE the upstream pipeline
        # — including any actor pools, whose concurrent duplicate pools
        # can starve a small cluster.  Materialize once; this path is the
        # interactive/small-data API (run() is the streaming path).
        ds = source.materialize()
        file_source = False
        sch = pa.schema(
            [(n, t) for n, t in zip(ds.schema().names, ds.schema().types)]
        )
        for rid, span, msg in plan.schema_violations(sch):
            schema_viols.append((rid, span, msg, -2))
        pat_rules = plan.pattern_column_rules(sch)
        n = ds.count()
        row_counts = {-2: n}

    if pat_rules:
        plan = CompiledPlan(
            **{**plan.__dict__, "row_rules": plan.row_rules + pat_rules})
    violations_ds = build_violations_dataset(
        ds, plan, manifests=manifests, path_to_pid=path_to_pid,
        batch_size=batch_size, file_source=file_source
    )
    # W1 for file sources: explicit hash exchange over ONLY the key
    # column (stages/unique.py) — no Dataset-groupby overhead, no
    # second full-column scan.  LAUNCHED BEFORE the narrow pass
    # executes so the two independent pipelines overlap (Ray schedules
    # their tasks together; the exchange's key-column scan fills the
    # narrow pass's scheduling gaps — measured ~2s off the headline).
    unique_launches: list = []
    if file_source and plan.unique_columns:
        from .stages.unique import (collect_duplicate_keys,
                                    dup_table_to_violations,
                                    launch_unique_violations_from_files)

        from .kernels import _schema_type_at

        for col in plan.unique_columns:
            # heterogeneous inputs: only scan files that HAVE the column
            # (path-aware — the unique key may be a nested struct field)
            ufiles = [files[p] for p in sorted(schemas)
                      if _schema_type_at(schemas[p], col) is not None]
            if not ufiles:
                continue
            merged = launch_unique_violations_from_files(
                ufiles, col, path_pids={f: path_to_pid[f] for f in ufiles})
            unique_launches.append((col, merged))
    refs = violations_ds.to_arrow_refs()
    tables = [t for t in ray.get(refs) if t.num_rows > 0]
    for col, merged in unique_launches:
        uv = dup_table_to_violations(collect_duplicate_keys(merged, col), col)
        if uv.num_rows:
            tables.append(uv)
    if tables:
        vt = pa.concat_tables([conform_violations(t) for t in tables])
    else:
        vt = VIOLATION_SCHEMA.empty_table()

    if schema_viols:
        sv = pa.table(
            {
                "doc_id": pa.array([""] * len(schema_viols), type=pa.string()),
                "rule_id": pa.array([r for r, _, _, _ in schema_viols], type=pa.string()),
                "span": pa.array([s for _, s, _, _ in schema_viols], type=pa.string()),
                "message": pa.array([m for _, _, m, _ in schema_viols], type=pa.string()),
                "partition_id": pa.array(
                    np.array([p for _, _, _, p in schema_viols], dtype=np.int32)),
            }
        )
        vt = pa.concat_tables([vt, conform_violations(sv)])

    # drift (W3) — needs a reference-epoch stats table
    if plan.drift is not None and drift_reference is not None:
        from .stages.drift import drift_violations

        dv = drift_violations(ds, plan.drift, drift_reference)
        if dv.num_rows:
            vt = pa.concat_tables([vt, conform_violations(dv)])

    verdicts = build_verdicts(vt, row_counts)
    summary = {
        "n_rows": int(sum(row_counts.values())),
        "n_partitions": len(row_counts),
        "n_violations": int(vt.num_rows),
        "pass": vt.num_rows == 0,
        "spec_hash": plan.spec.spec_hash() if hasattr(plan.spec, "spec_hash") else None,
    }
    return ValidationReport(violations=vt, verdicts=verdicts, summary=summary)


def build_verdicts(violations: pa.Table, row_counts: dict[int, int]) -> pd.DataFrame:
    """Per-partition verdict rows (W4) from a violations table."""
    vdf = violations.select(["partition_id", "rule_id"]).to_pandas()
    counts = (vdf.groupby(["partition_id", "rule_id"]).size()
              .rename("cnt").reset_index())
    return build_verdicts_from_counts(counts, row_counts)


def build_verdicts_from_counts(counts: pd.DataFrame,
                               row_counts: dict[int, int]) -> pd.DataFrame:
    """Per-partition verdicts from pre-aggregated (partition_id, rule_id,
    cnt) rows — the scalable path (violations never materialize on the
    driver).  Partition -1 (global rules) is excluded from per-partition
    verdicts but counted in the summary.  -2 (in-memory dataset) counts
    ARE attributed when the caller tracks a -2 partition (row_counts has
    the key) — it is the dataset's own partition, and dropping its
    counts would emit a false ``pass=True`` verdict row."""
    per = (counts[counts.partition_id.isin(list(row_counts))]
           if len(counts) else counts)
    rows = []
    for pid in sorted(row_counts):
        g = per[per.partition_id == pid] if len(per) else per
        nv = int(g["cnt"].sum()) if len(g) else 0
        rc = ({str(r.rule_id): int(r.cnt) for r in g.itertuples()}
              if nv else {})
        rows.append(
            {
                "partition_id": pid,
                "n_rows": int(row_counts[pid]),
                "n_violations": nv,
                "pass": nv == 0,
                "rule_counts": json.dumps(rc, sort_keys=True),
            }
        )
    return pd.DataFrame(
        rows, columns=["partition_id", "n_rows", "n_violations", "pass", "rule_counts"]
    )
