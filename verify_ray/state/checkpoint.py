"""Per-partition-group checkpoints with lineage (SURVEY §4).

A checkpoint records: the spec hash (resume is invalidated by spec
changes), the exact input files of the group with their row counts
(lineage), and per-partition violation/rule counts (metrics).  It is
written ATOMICALLY (tmp file + rename) only after the group's output
parquet has fully landed, so a resumed run can trust any checkpoint it
finds and skip the whole group.
"""

from __future__ import annotations

import json
import os
import tempfile


def checkpoint_path(out_dir: str, group_id: int) -> str:
    return os.path.join(out_dir, "checkpoints", f"group-{group_id:06d}.json")


def write_checkpoint(out_dir: str, group_id: int, payload: dict) -> str:
    path = checkpoint_path(out_dir, group_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, sort_keys=True)
    os.replace(tmp, path)  # atomic on POSIX
    return path


def read_checkpoint(out_dir: str, group_id: int) -> dict | None:
    path = checkpoint_path(out_dir, group_id)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None


def completed_groups(out_dir: str, spec_hash: str,
                     expected_files: dict[int, list[str]]) -> set[int]:
    """Group ids whose checkpoint matches the current spec AND the exact
    file list — a changed spec or reshuffled inputs invalidates resume."""
    done: set[int] = set()
    for gid, files in expected_files.items():
        cp = read_checkpoint(out_dir, gid)
        if cp and cp.get("spec_hash") == spec_hash and cp.get("files") == files:
            done.add(gid)
    return done
