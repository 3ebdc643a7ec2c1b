"""sources.bloomindex: per-file Bloom filters, point-lookup pruning."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def layout(tmp_path):
    # 6 files, disjoint key ranges, NOT sorted by key (shuffled rows)
    rng = np.random.default_rng(3)
    root = str(tmp_path / "files")
    os.makedirs(root)
    for i in range(6):
        keys = np.arange(i * 100, (i + 1) * 100, dtype=np.int64)
        rng.shuffle(keys)
        pq.write_table(
            pa.table({"k": keys,
                      "v": keys * 2}),
            f"{root}/part-{i}.parquet")
    return root


def test_bloom_prunes_and_matches_full_scan(ray_session, layout):
    from verify_ray.sources.bloomindex import (bloom_pruned_read,
                                               build_bloom_index)

    idx = build_bloom_index(layout, "k")
    assert len(idx) == 6
    # keys live in files 0 and 3 only
    ds, stats = bloom_pruned_read(layout, "k", [7, 342], index=idx)
    assert stats["files_total"] == 6
    assert stats["files_read"] <= 3  # 2 + rare false positives
    out = ds.to_pandas().sort_values("k").reset_index(drop=True)
    ref = pd.DataFrame({"k": [7, 342], "v": [14, 684]})
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_bloom_never_false_negative(ray_session, layout):
    from verify_ray.sources.bloomindex import (bloom_pruned_read,
                                               build_bloom_index)

    idx = build_bloom_index(layout, "k")
    # every key present somewhere must be found (bloom has no false
    # negatives by construction)
    keys = [0, 99, 100, 250, 599]
    ds, _ = bloom_pruned_read(layout, "k", keys, index=idx)
    assert sorted(ds.to_pandas()["k"]) == sorted(keys)


def test_bloom_all_pruned_empty_typed(ray_session, layout):
    from verify_ray.sources.bloomindex import (bloom_pruned_read,
                                               build_bloom_index)

    idx = build_bloom_index(layout, "k")
    ds, stats = bloom_pruned_read(layout, "k", [10_000, 20_000],
                                  columns=["k"], index=idx)
    # absent keys: typically every file pruned (false positives may
    # keep a file, but the row result must still be empty)
    assert ds.count() == 0
    assert [f.name for f in ds.schema().base_schema] == ["k"]
    assert stats["rows_skipped_bound"] >= 300


def test_bloom_string_and_int_keys_agree(ray_session, layout):
    # the hash contract is over the STRING form: int 7 and "7" hit
    # the same file set
    from verify_ray.sources.bloomindex import (_key_hashes,
                                               _maybe_contains,
                                               build_bloom_index)

    idx = build_bloom_index(layout, "k")
    hi = _key_hashes(pa.array(["7"]))
    hs = _key_hashes(pa.array([str(7)]))
    assert (hi == hs).all()
    assert sum(_maybe_contains(e, hi) for e in idx) >= 1
