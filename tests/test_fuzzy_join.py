"""joins.fuzzy_join: multi-blocker candidate generation + integer
char-3-gram Jaccard verification."""

import numpy as np
import pyarrow as pa


def _side(ids, keys, id_name, blocks: int = 2):
    import ray.data as rd

    t = pa.table({id_name: pa.array(ids, type=pa.int64()),
                  "k": pa.array(keys, type=pa.string())})
    n = t.num_rows
    step = max(1, n // blocks)
    return rd.from_arrow([t.slice(i, step) for i in range(0, n, step)])


def _jacc(a, b):
    ga = {a[i:i + 3] for i in range(len(a) - 2)}
    gb = {b[i:i + 3] for i in range(len(b) - 2)}
    inter = len(ga & gb)
    return inter, len(ga) + len(gb) - inter


def test_fuzzy_join_finds_mutations_any_position(ray_session):
    from verify_ray.pipelines.joins import fuzzy_join

    base = "the quick brown fox jumps over the lazy dog"
    lids = [1, 2, 3]
    lkeys = [base, "completely different sentence here today",
             "another unrelated line of text entirely"]
    # mutate base at the front (prefix block broken, suffix survives)
    # and at the back (suffix broken, prefix survives)
    rkeys = ["Xhe quick brown fox jumps over the lazy dog",
             "the quick brown fox jumps over the lazy doX"]
    rids = [11, 12]
    out = (fuzzy_join(_side(lids, lkeys, "lid"),
                      _side(rids, rkeys, "rid"),
                      left_id="lid", right_id="rid", key="k",
                      tau_permille=700, num_buckets=4)
           .to_pandas().sort_values(["lid", "rid"])
           .reset_index(drop=True))
    got = set(zip(out["lid"], out["rid"]))
    assert (1, 11) in got and (1, 12) in got
    assert all(lid == 1 for lid, _ in got)  # unrelated lines no match
    # inter/uni match the scalar reference
    for _, row in out.iterrows():
        ref_i, ref_u = _jacc(lkeys[0], rkeys[row["rid"] - 11])
        assert (row["inter"], row["uni"]) == (ref_i, ref_u)


def test_fuzzy_join_pair_via_both_blocks_emitted_once(ray_session):
    from verify_ray.pipelines.joins import fuzzy_join

    s = "identical prefix and suffix stay same"
    out = (fuzzy_join(_side([1], [s], "lid"),
                      _side([2], [s], "rid"),
                      left_id="lid", right_id="rid", key="k",
                      tau_permille=700, num_buckets=4)
           .to_pandas())
    assert len(out) == 1  # found via P and S blocks, deduped
    assert out.loc[0, "inter"] == out.loc[0, "uni"]


def test_fuzzy_join_both_end_edits_escape_blocking(ray_session):
    from verify_ray.pipelines.joins import fuzzy_join

    # documented recall contract: edits corrupting BOTH the prefix-8
    # and suffix-8 blocks produce no candidate even if similar
    a = "abcdefgh middle part stays equal qrstuvwx"
    b = "Xbcdefgh middle part stays equal qrstuvwX"
    out = fuzzy_join(_side([1], [a], "lid"), _side([2], [b], "rid"),
                     left_id="lid", right_id="rid", key="k",
                     tau_permille=100, num_buckets=4)
    assert out.count() == 0


def test_fuzzy_join_threshold_excludes_dissimilar(ray_session):
    from verify_ray.pipelines.joins import fuzzy_join

    # same prefix-8 (candidates) but different tails -> low jaccard
    a = "shared08 aaaa bbbb cccc dddd eeee ffff"
    b = "shared08 zzzz yyyy xxxx wwww vvvv uuuu"
    out = fuzzy_join(_side([1], [a], "lid"), _side([2], [b], "rid"),
                     left_id="lid", right_id="rid", key="k",
                     tau_permille=700, num_buckets=4)
    assert out.count() == 0
    i, u = _jacc(a, b)
    assert i * 1000 < 700 * u  # sanity: genuinely below threshold
