"""The scalable, resumable validation runner (W5) + CLI.

Unlike ``engine.validate`` (which materializes the report for
interactive use), ``run()`` is the 100 TB path:

  * inputs are processed in **partition groups** of G files; each group
    is one streaming Dataset pipeline (G sized so a group still saturates
    the cluster), and each finished group writes an atomic checkpoint —
    ``--resume`` skips finished groups, so a killed run loses at most
    one group;
  * the narrow pass is **single-read**: one ``map_batches`` over the
    projected columns emits violation rows AND per-batch uniqueness
    partial counts AND drift sketch partials in one unified stream,
    hive-partitioned by kind at the sink
    (``kind=v`` violations / ``kind=c`` key counts / ``kind=s`` sketches)
    — the token column is read exactly once;
  * violations stream straight to Parquet — they NEVER collect on the
    driver;
  * the final phase runs only over the small partials: uniqueness =
    ``groupby(key).sum`` over pre-aggregated ``(key, cnt)`` rows (the
    shuffle moves one row per distinct key per batch, never raw rows —
    pre-aggregation is the skew/hot-key handling), drift = sketch-blob
    merge, verdicts = per-partition counts from the violation columns.

CLI::

    python -m verify_ray.run --spec specs/sequences.yaml \
        --input /data/sequences --output /tmp/out \
        --manifest source_manifest=/data/manifest.parquet \
        [--drift-reference stats.parquet] [--resume] [--group-size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .engine import build_verdicts_from_counts
from .errors import VIOLATION_SCHEMA
from .kernels import as_array, CompiledPlan
from .spec import ConstraintSpec
from .sources.parquet import list_input_files, scan_inputs
from .stages.referential import rule_for_ref_check
from .state import checkpoint as ckpt

RAW_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("doc_id", pa.string()),
        ("rule_id", pa.string()),
        ("span", pa.string()),
        ("first_span", pa.string()),
        ("message", pa.string()),
        ("partition_id", pa.int32()),
        ("cnt", pa.int64()),
        ("sketch", pa.binary()),
    ]
)


def _make_combined_fn(plan: CompiledPlan, path_to_pid, drift):
    """One pass, three outputs: violations + unique-key partial counts +
    sketch partials, as a unified mixed-kind table.  The per-file
    lineage split happens ONCE (stages/validate.split_by_path) and
    feeds both the validator and the key partials."""
    from .stages.validate import split_by_path, stamp_partition

    unique_cols = list(plan.unique_columns)
    sketch_fn = None
    if drift is not None:
        from .stages.drift import _make_partials_fn

        sketch_fn = _make_partials_fn(drift)


    def pad(t: pa.Table, kind: str, cnt=None, sketch=None) -> pa.Table:
        n = t.num_rows
        null_str = pa.nulls(n, pa.string())
        return pa.table(
            {
                "kind": pa.array([kind] * n, type=pa.string()),
                "doc_id": t.column("doc_id") if "doc_id" in t.column_names else null_str,
                "rule_id": t.column("rule_id") if "rule_id" in t.column_names else null_str,
                "span": t.column("span") if "span" in t.column_names else null_str,
                "first_span": (t.column("first_span")
                               if "first_span" in t.column_names else null_str),
                "message": t.column("message") if "message" in t.column_names else null_str,
                "partition_id": (t.column("partition_id")
                                 if "partition_id" in t.column_names
                                 else pa.nulls(n, pa.int32())),
                "cnt": cnt if cnt is not None else pa.nulls(n, pa.int64()),
                "sketch": sketch if sketch is not None else pa.nulls(n, pa.binary()),
            }
        )

    def key_partials(sub: pa.Table, pid: int) -> list[pa.Table]:
        """Per-(file, key) count partials, stamped with the file's pid —
        finalize min-aggregates it into the NotUnique first-seen span."""
        import numpy as np

        from .kernels import _col, _has_col

        out = []
        for col in unique_cols:
            if not _has_col(sub, col):
                continue  # heterogeneous inputs: file lacks this column
            vc = pc.value_counts(as_array(_col(sub, col)))
            vals, cnts = vc.field("values"), vc.field("counts")
            mask = pc.is_valid(vals)
            keys = pc.cast(vals.filter(mask), pa.string())
            # span carries the COLUMN the partial belongs to, so finalize
            # can separate multi-unique-column streams
            kt = pa.table({
                "doc_id": keys,
                "span": pa.array([col] * len(keys), type=pa.string()),
                "partition_id": pa.array(
                    np.full(len(keys), pid, dtype=np.int32)),
            })
            out.append(pad(kt, "c", cnt=pc.cast(cnts.filter(mask), pa.int64())))
        return out

    def combined(batch: pa.Table) -> pa.Table:
        # ONE per-file lineage split feeds validation AND key partials
        subs = split_by_path(batch, path_to_pid)
        parts = []
        for sub, pid in subs:
            parts.append(pad(stamp_partition(plan.validate_batch(sub), pid),
                             "v"))
            parts.extend(key_partials(sub, pid))
        if sketch_fn is not None:
            whole = (subs[0][0] if len(subs) == 1 else
                     pa.concat_tables([s for s, _ in subs]))
            st = sketch_fn(whole)
            gt = pa.table({"doc_id": st.column("group")})
            parts.append(pad(gt, "s", sketch=st.column("sketch")))
        return pa.concat_tables([p.cast(RAW_SCHEMA) for p in parts])

    return combined


def run(
    spec,
    input_path,
    output_dir: str,
    manifests: dict | None = None,
    drift_reference: str | None = None,
    group_size: int = 64,
    resume: bool = True,
    batch_size: int | None = None,
) -> dict:
    """Execute the full resumable pipeline; returns the run report dict."""
    import ray.data as rd

    if isinstance(spec, str):
        spec = ConstraintSpec.from_yaml(spec)
    if isinstance(spec, dict):
        spec = ConstraintSpec.from_dict(spec)
    plan = spec.compile()
    spec_hash = spec.spec_hash()

    files = list_input_files(input_path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_path!r}")
    path_to_pid = {f: i for i, f in enumerate(files)}
    row_counts, schemas = scan_inputs(files)

    groups: dict[int, list[str]] = {}
    for i in range(0, len(files), group_size):
        groups[i // group_size] = files[i: i + group_size]

    os.makedirs(output_dir, exist_ok=True)
    done = ckpt.completed_groups(output_dir, spec_hash, groups) if resume else set()

    # schema-level violations (footer-only; recorded in the report)
    schema_viols = []
    for pid, sch in schemas.items():
        for rid, span, msg in plan.schema_violations(sch):
            schema_viols.append(
                {"doc_id": "", "rule_id": rid, "span": span, "message": msg,
                 "partition_id": pid}
            )

    # referential + pattern-column rules ride the narrow pass
    from .sources.parquet import union_schema

    usch = union_schema(schemas)
    rules = list(plan.row_rules)
    for rc in plan.ref_checks:
        rules.append(rule_for_ref_check(rc, manifests))
    pat_rules = plan.pattern_column_rules(usch)
    rules.extend(pat_rules)
    narrow_plan = CompiledPlan(**{**plan.__dict__, "row_rules": rules})

    cols = [c for c in plan.referenced_columns if c in usch.names]
    cols += sorted({r.column for r in pat_rules} - set(cols))
    t0 = time.time()
    ran = []
    for gid in sorted(groups):
        if gid in done:
            continue
        gfiles = groups[gid]
        gdir = os.path.join(output_dir, "groups", f"g={gid:06d}")
        from .sources.parquet import read_projected

        gschemas = {i: schemas[path_to_pid[f]] for i, f in enumerate(gfiles)}
        ds = read_projected(gfiles, gschemas, cols)
        combined = _make_combined_fn(narrow_plan, path_to_pid, plan.drift)
        kwargs = dict(batch_format="pyarrow", zero_copy_batch=True)
        if batch_size is not None:
            kwargs["batch_size"] = batch_size
        out = ds.map_batches(combined, **kwargs)
        out.write_parquet(gdir, partition_cols=["kind"], mode="overwrite")
        payload = {
            "spec_hash": spec_hash,
            "group_id": gid,
            "files": gfiles,
            "row_counts": {str(path_to_pid[f]): row_counts[path_to_pid[f]]
                           for f in gfiles},
            "wall_sec": round(time.time() - t0, 3),
        }
        ckpt.write_checkpoint(output_dir, gid, payload)
        ran.append(gid)

    # ---- final phase: small-data wide ops over the partials ----
    report = _finalize(
        output_dir, plan, groups, row_counts, schema_viols, drift_reference
    )
    report["spec_hash"] = spec_hash
    report["groups_total"] = len(groups)
    report["groups_ran"] = len(ran)
    report["groups_resumed"] = len(done)
    report["wall_sec"] = round(time.time() - t0, 3)
    with open(os.path.join(output_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    return report


def _finalize(output_dir, plan, groups, row_counts, schema_viols,
              drift_reference) -> dict:
    import glob as _glob

    import ray.data as rd

    global_dir = os.path.join(output_dir, "violations_global")
    os.makedirs(global_dir, exist_ok=True)

    def _group_files(kind: str) -> list[str]:
        # glob ONLY this run's group ids — a reused output dir can hold
        # stale g=... directories from a previous run with a different
        # file set / --group-size; merging those silently corrupts
        # uniqueness, drift, and verdicts
        out = []
        for gid in sorted(groups):
            out.extend(_glob.glob(os.path.join(
                output_dir, "groups", f"g={gid:06d}",
                f"kind={kind}", "*.parquet")))
        return sorted(out)

    # W1 uniqueness over the pre-aggregated (key, cnt) partials, via the
    # explicit hash exchange (stages/unique.find_duplicate_keys)
    count_files = _group_files("c")
    n_global = 0
    if count_files and plan.unique_columns:
        import ray

        from .stages.unique import dup_table_to_violations, find_duplicate_keys

        cpus = int(ray.cluster_resources().get("CPU", 8))
        fgroups = [count_files[i:i + 8] for i in range(0, len(count_files), 8)]
        os.makedirs(os.path.join(global_dir, "unique"), exist_ok=True)
        # partials of all unique columns share the kind=c stream, tagged
        # by their column in `span` — separate them per column here
        for col in plan.unique_columns:
            dups = find_duplicate_keys(fgroups, "doc_id",
                                       num_buckets=max(4, min(64, cpus)),
                                       cnt_column="cnt", where=("span", col),
                                       first_pid_column="partition_id")
            names = ([col, "cnt", "first_pid"] if dups.num_columns == 3
                     else [col, "cnt"])
            uv = dup_table_to_violations(dups.rename_columns(names), col)
            pq.write_table(uv, os.path.join(global_dir, "unique",
                                            f"dups-{col}.parquet"))
            n_global += uv.num_rows

    # W3 drift over the sketch partials
    drift_rows = []
    sketch_files = _group_files("s")
    if sketch_files and plan.drift is not None and drift_reference is not None:
        from .stages.drift import _merge_block
        from .state.sketches import GroupedSketch

        sk = rd.read_parquet(sketch_files, columns=["doc_id", "sketch"])
        sk = sk.map_batches(
            lambda t: _merge_block(t.rename_columns(["group", "sketch"])),
            batch_format="pyarrow", batch_size=4096)
        merged: dict[str, GroupedSketch] = {}
        for b in sk.iter_batches(batch_format="pyarrow"):
            for g, blob in zip(b.column("group").to_pylist(),
                               b.column("sketch").to_pylist()):
                s = GroupedSketch.from_bytes(blob)
                merged[g] = merged[g].merge(s) if g in merged else s
        from .stages.drift import _compare_sketches

        drift_rows = _compare_sketches(merged, plan.drift, drift_reference)
        if drift_rows:

            pq.write_table(
                pa.Table.from_pylist(drift_rows, schema=VIOLATION_SCHEMA),
                os.path.join(global_dir, "drift.parquet"))
        n_global += len(drift_rows)

    # W4 verdicts from the per-partition violation counts.  Violations
    # can be huge, so counts are pre-aggregated per batch inside
    # map_batches; only (partition_id, rule_id, cnt) partials reach the
    # driver — never the violation rows themselves.
    viol_files = _group_files("v")
    import pandas as pd

    if viol_files:
        def count_partial(t: pa.Table) -> pa.Table:
            g = t.group_by(["partition_id", "rule_id"]).aggregate(
                [("rule_id", "count")])
            return g.rename_columns(["partition_id", "rule_id", "cnt"])

        partials = (rd.read_parquet(viol_files,
                                    columns=["partition_id", "rule_id"])
                    .map_batches(count_partial, batch_format="pyarrow")
                    .to_pandas())
        counts = (partials.groupby(["partition_id", "rule_id"], as_index=False)
                  ["cnt"].sum())
    else:
        counts = pd.DataFrame({"partition_id": [], "rule_id": [], "cnt": []})
    for sv in schema_viols:
        counts = pd.concat([counts, pd.DataFrame(
            [{"partition_id": sv["partition_id"], "rule_id": sv["rule_id"],
              "cnt": 1}])], ignore_index=True)
    verdicts = build_verdicts_from_counts(counts, row_counts)
    pq.write_table(pa.Table.from_pandas(verdicts, preserve_index=False),
                   os.path.join(output_dir, "verdicts.parquet"))
    n_narrow = int(counts["cnt"].sum()) if len(counts) else 0
    return {
        "n_rows": int(sum(row_counts.values())),
        "n_partitions": len(row_counts),
        "n_violations_narrow": n_narrow,
        "n_violations_global": int(n_global),
        "pass": n_narrow == 0 and n_global == 0,
        "verdicts_path": os.path.join(output_dir, "verdicts.parquet"),
    }


def main(argv=None):
    p = argparse.ArgumentParser(prog="verify_ray.run", description=__doc__)
    p.add_argument("--spec", required=False)
    p.add_argument("--input", required=False)
    p.add_argument("--output", required=False)
    p.add_argument("--manifest", action="append", default=[],
                   help="name=path.parquet (repeatable)")
    p.add_argument("--drift-reference")
    p.add_argument("--group-size", type=int, default=64)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 8)))
    p.add_argument("--smoke", action="store_true",
                   help="self-contained smoke run on synthetic data under /tmp")
    p.add_argument("--make-reference-stats", metavar="OUT_PARQUET",
                   help="instead of validating, compute the drift "
                        "reference-epoch stats table from --input (requires "
                        "a --spec with a drift section) and write it here")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # Ship the package to every worker via runtime_env py_modules:
        # without it, workers resolve `verify_ray` only through the
        # driver's cwd (single-node accident), and a `ray job submit`
        # from anywhere else — or to a real multi-node cluster — dies
        # with ModuleNotFoundError in the first map task.  py_modules
        # uploads the package dir once to GCS and prepends it to every
        # worker's sys.path (the north rule's "submitted via ray job
        # submit on fixed multi-node clusters" clause).
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR",
                 runtime_env={"py_modules": [pkg_dir]})
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    try:
        if args.make_reference_stats:
            if not (args.spec and args.input):
                p.error("--make-reference-stats requires --spec and --input")
            spec = ConstraintSpec.from_yaml(args.spec)
            if spec.drift is None:
                p.error("the spec has no drift section")
            from .stages.drift import make_reference_stats

            t = make_reference_stats(args.input, spec.drift,
                                     out_path=args.make_reference_stats)
            print(json.dumps({"reference_stats": args.make_reference_stats,
                              "groups": t.num_rows,
                              "rows": int(sum(t.column("row_count").to_pylist()))}))
            return
        if args.smoke:
            import tempfile

            import pyarrow.parquet as _pq

            from .sources.synth import default_spec_dict, make_manifest, make_sequences

            base = tempfile.mkdtemp(prefix="verify_ray_smoke_")
            make_sequences(os.path.join(base, "seq"), n_rows=20_000, n_files=8)
            mpath = make_manifest(base)
            report = run(
                default_spec_dict(max_n_tok=256),
                os.path.join(base, "seq"),
                os.path.join(base, "out"),
                manifests={"source_manifest": _pq.read_table(mpath)},
                group_size=3,
            )
        else:
            if not (args.spec and args.input and args.output):
                p.error("--spec/--input/--output required (or --smoke)")
            manifests = {}
            import pyarrow.parquet as _pq

            for m in args.manifest:
                name, path = m.split("=", 1)
                manifests[name] = _pq.read_table(path)
            report = run(
                args.spec, args.input, args.output,
                manifests=manifests or None,
                drift_reference=args.drift_reference,
                group_size=args.group_size,
                resume=not args.no_resume,
                batch_size=args.batch_size,
            )
        print(json.dumps(report, indent=2, sort_keys=True))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
