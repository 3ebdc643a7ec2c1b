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
