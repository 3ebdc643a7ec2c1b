"""Resumable partitioned-parquet sink for pipeline outputs.

Ray Data's ``ds.write_parquet`` is all-or-nothing: a failure 90% in
leaves undifferentiated partial files and the restart rewrites
everything.  At 100 TB output must be RESUMABLE, so this sink makes
the unit of work explicit — one SHARD (an input partition, a key
range, a date) — and commits each shard atomically:

    out_dir/shard=<key>/  *.parquet      (the shard's data)
    out_dir/shard=<key>/_SUCCESS.json    (commit marker, written LAST
                                          via tmp+rename)

A restart calls the same function and skips every shard whose marker
matches the caller's ``fingerprint`` (spec hash, code version, input
snapshot id — anything whose change must invalidate old output); a
mismatched or missing marker re-runs just that shard, overwriting its
directory.  This is the generalization of ``run()``'s per-file-group
checkpointing (run.py / state/checkpoint.py) to arbitrary pipeline
outputs.

Scale notes: shards run SEQUENTIALLY on the driver but each shard's
write is a fully distributed Ray Data job — size shards so one is a
few minutes of work (the resume quantum), not so small that per-shard
Dataset setup dominates.  Markers record row counts, so a cheap
post-hoc audit (``audit_shards``) can verify a finished run without
reading data files.
"""

from __future__ import annotations

import json
import os
import time


def _marker_path(shard_dir: str) -> str:
    return os.path.join(shard_dir, "_SUCCESS.json")


def _write_marker(shard_dir: str, payload: dict) -> None:
    tmp = _marker_path(shard_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, _marker_path(shard_dir))  # atomic on POSIX


def read_marker(out_dir: str, key: str) -> dict | None:
    p = _marker_path(os.path.join(out_dir, f"shard={key}"))
    try:
        with open(p) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def write_sharded(shards: dict, out_dir: str, fingerprint: str = "",
                  partition_cols: list | None = None) -> dict:
    """Write ``{shard_key: make_ds}`` resumably: each ``make_ds()``
    returns the shard's ``ray.data.Dataset`` (built lazily so skipped
    shards cost nothing); a shard whose ``_SUCCESS.json`` already
    matches ``fingerprint`` is skipped.  Returns
    ``{"written": [...], "skipped": [...], "rows": {key: n}}``.
    """
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    written, skipped, rows = [], [], {}
    for key, make_ds in shards.items():
        skey = str(key)
        shard_dir = os.path.join(out_dir, f"shard={skey}")
        marker = read_marker(out_dir, skey)
        if marker is not None and marker.get("fingerprint") == fingerprint:
            skipped.append(skey)
            rows[skey] = marker["rows"]
            continue
        # stale or absent: rebuild the whole shard directory
        shutil.rmtree(shard_dir, ignore_errors=True)
        os.makedirs(shard_dir, exist_ok=True)
        t0 = time.time()
        ds = make_ds()
        kw = {"partition_cols": partition_cols} if partition_cols else {}
        ds.write_parquet(shard_dir, **kw)  # streaming, never held whole
        # row count from parquet footers only (no data read-back)
        import pyarrow.parquet as pq

        n = 0
        for root, _, files in os.walk(shard_dir):
            for f in files:
                if f.endswith(".parquet"):
                    n += pq.ParquetFile(
                        os.path.join(root, f)).metadata.num_rows
        _write_marker(shard_dir, {
            "fingerprint": fingerprint,
            "rows": n,
            "wall_sec": round(time.time() - t0, 3),
        })
        written.append(skey)
        rows[skey] = n
    return {"written": written, "skipped": skipped, "rows": rows}


def audit_shards(out_dir: str, fingerprint: str = "") -> dict:
    """Cheap completeness audit from markers alone: which shard dirs
    are committed under this fingerprint, which are stale/partial."""
    ok, stale = [], []
    if os.path.isdir(out_dir):
        for name in sorted(os.listdir(out_dir)):
            if not name.startswith("shard="):
                continue
            key = name[len("shard="):]
            m = read_marker(out_dir, key)
            (ok if m is not None and m.get("fingerprint") == fingerprint
             else stale).append(key)
    return {"committed": ok, "stale_or_partial": stale,
            "total_rows": sum(read_marker(out_dir, k)["rows"] for k in ok)}


def compact_shards(in_dir: str, out_dir: str, target_rows: int = 1_000_000,
                   pattern: str = "*.parquet") -> dict:
    """Small-file compaction — rewrite a directory of many small
    parquet files into ~``target_rows``-row shards (the maintenance
    pass every long-running partitioned sink needs: thousands of tiny
    per-checkpoint files destroy read parallelism economics).

    Planning touches FOOTERS only (row counts; zero data bytes): input
    files sort by name and greedily pack whole-file spans into shards,
    so the plan is deterministic and the same inputs always produce
    the same layout.  Each shard is then written by ONE Ray task
    reading only its own span; a ``_shard-NNNNN.done`` marker (input
    span + row count, ``_``-prefixed so Arrow dataset reads of the
    output directory skip it) per shard makes re-runs SKIP finished
    shards — the same crash-resume contract as ``write_sharded``.
    Returns ``{shards, written, skipped, total_rows}``.
    """
    import glob as _glob

    import pyarrow.parquet as _pq
    import ray

    files = sorted(_glob.glob(os.path.join(in_dir, pattern)))
    os.makedirs(out_dir, exist_ok=True)
    counts = [_pq.read_metadata(f).num_rows for f in files]
    # greedy whole-file packing: close a shard once it reaches target
    spans, cur, cur_rows = [], [], 0
    for f, n in zip(files, counts):
        cur.append(f)
        cur_rows += n
        if cur_rows >= target_rows:
            spans.append((cur, cur_rows))
            cur, cur_rows = [], 0
    if cur:
        spans.append((cur, cur_rows))

    @ray.remote
    def write_shard(idx: int, span: list, n_rows: int) -> int:
        import pyarrow as _pa
        import pyarrow.parquet as _pq

        path = os.path.join(out_dir, f"shard-{idx:05d}.parquet")
        t = _pa.concat_tables([_pq.read_table(f) for f in span])
        _pq.write_table(t, path)
        with open(os.path.join(out_dir, f"_shard-{idx:05d}.done"),
                  "w") as fh:
            json.dump({"inputs": [os.path.basename(f) for f in span],
                       "rows": n_rows}, fh)
        return n_rows

    written, skipped, refs = [], [], []
    for i, (span, n_rows) in enumerate(spans):
        marker = os.path.join(out_dir, f"_shard-{i:05d}.done")
        if os.path.exists(marker):
            skipped.append(i)
            continue
        written.append(i)
        refs.append(write_shard.remote(i, span, n_rows))
    ray.get(refs)
    return {"shards": len(spans), "written": written,
            "skipped": skipped,
            "total_rows": int(sum(n for _, n in spans))}


def write_jsonl_sharded(shards: dict, out_dir: str,
                        fingerprint: str = "") -> dict:
    """``write_sharded`` with a JSONL payload instead of parquet —
    the interchange sink for downstream tools that eat line-JSON
    (annotation UIs, legacy loaders, eval harnesses).  Same
    crash-resume contract: a shard whose ``_SUCCESS.json`` matches
    ``fingerprint`` is skipped; a stale shard directory is rebuilt
    whole.  Rows stream through Ray's ``write_json`` writer — the
    shard is never held in one task.  Row counts come from a line
    count over the written files (JSONL has no footer metadata —
    one sequential read of what was just written, cheaper than a
    parse).  Returns ``{"written", "skipped", "rows"}``.
    """
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    written, skipped, rows = [], [], {}
    for key, make_ds in shards.items():
        skey = str(key)
        shard_dir = os.path.join(out_dir, f"shard={skey}")
        marker = read_marker(out_dir, skey)
        if marker is not None and marker.get("fingerprint") == fingerprint:
            skipped.append(skey)
            rows[skey] = marker["rows"]
            continue
        shutil.rmtree(shard_dir, ignore_errors=True)
        os.makedirs(shard_dir, exist_ok=True)
        t0 = time.time()
        make_ds().write_json(shard_dir)
        n = 0
        for root, _, files in os.walk(shard_dir):
            for f in files:
                if f.endswith(".json") or f.endswith(".jsonl"):
                    with open(os.path.join(root, f), "rb") as fh:
                        n += sum(1 for _ in fh)
        _write_marker(shard_dir, {
            "fingerprint": fingerprint,
            "rows": n,
            "wall_sec": round(time.time() - t0, 3),
        })
        written.append(skey)
        rows[skey] = n
    return {"written": written, "skipped": skipped, "rows": rows}
