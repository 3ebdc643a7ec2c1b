"""Mimics the driver's correctness gate: every queries() entry runs at
sf0.01; entries with an oracle_sql() are compared against DuckDB
(sorted columns + rows, exact values); rows-only entries must return a
stable non-erroring result."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    return importlib.import_module("__ray_entry__")


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


ORACLE_NAMES = None


def _oracle_names(entry_mod):
    return sorted(entry_mod.oracle_sql())


def test_entry_smoke(entry_mod):
    res = entry_mod.entry()
    df = to_df(res)
    assert list(df.columns) == ["doc_id", "rule_id", "span"]
    assert len(df) >= 0


def test_queries_cover_oracles(entry_mod):
    # as of round 3 the rows-only set is EMPTY: every queries() entry
    # must carry a DuckDB oracle (and vice versa)
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) == set(q), (
        f"unoracled: {sorted(set(q) - set(o))}; "
        f"dangling oracles: {sorted(set(o) - set(q))}")


@pytest.mark.parametrize("name", [
    "validate_documents", "validate_orders", "validate_lineitem",
    "validate_events", "validate_part", "validate_nested",
    "validate_tagged", "validate_supplier", "events_sessionize",
    "stats_docs_by_lang", "stats_by_lang_source", "pricing_summary",
    "events_window_day", "events_window_hopping", "top_customers",
    "top_lineitems", "revenue_by_segment",
    "revenue_by_region", "events_orphan_users", "dedup_exact",
    "dedup_exact_dups", "text_token_count",
    "text_fingerprint", "ann_topk", "embedding_near_dup", "media_metadata",
    "dedup_ngram_jaccard_planted",
    "profile_documents",
    "sequences_validate", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "dedup_groups", "text_langid", "text_quality",
    "token_topk_by_source", "infer_documents_spec", "dedup_exact_filter",
    "embedding_near_dup_lsh", "ann_topk_ivf", "media_frame_sample",
    "sample_documents", "sample_stratified", "text_normalize",
    "pack_sequences", "validate_map_column", "ann_topk_lsh",
    "stats_quantiles_by_lang", "text_repetition", "text_redact",
    "text_boilerplate", "decontaminate", "semantic_dedup",
    "docs_global_rank", "user_histories", "resample_mix",
    "knn_join_embeddings", "latest_event_per_user",
    "events_pivot_weekday", "sorted_range_shards",
    "events_json_extract", "postings_index", "quality_filter_per_lang",
    "training_mix_build", "langid_confusion", "docs_rollup_counts",
    "events_keyed_scan", "graph_pagerank", "fuzzy_join_titles",
    "events_rolling_distinct", "events_user_stats",
    "media_decode_stats", "docs_topk_per_lang",
    "approx_distinct_users", "decontaminate_bloom",
])
def test_query_matches_oracle(entry_mod, ducks, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    mine = normalize(to_df(q(SF_DIR)))
    orc = normalize(ducks.execute(sql).fetchdf())
    assert list(mine.columns) == list(orc.columns), (
        f"column mismatch: {list(mine.columns)} vs {list(orc.columns)}")
    assert len(mine) == len(orc), f"row count {len(mine)} vs {len(orc)}"
    for c in mine.columns:
        a, b = mine[c].to_numpy(), orc[c].to_numpy()
        if np.issubdtype(mine[c].dtype, np.floating):
            assert np.allclose(a.astype(float), b.astype(float),
                               rtol=0, atol=1e-9, equal_nan=True), f"{name}.{c}"
        else:
            neq = a != b
            assert not neq.any(), (
                f"{name}.{c}: first diffs {list(zip(a[neq][:5], b[neq][:5]))}")


@pytest.mark.parametrize("name", [
    "ann_topk_lsh",
])
def test_rows_only_queries_run(entry_mod, name):
    res = to_df(entry_mod.queries()[name](SF_DIR))
    assert res is not None
    assert len(res.columns) > 0


def test_near_dup_pipelines_find_planted_dups(entry_mod):
    """The planted mutated copies must surface as near-dup pairs."""
    for name in ("dedup_minhash_lsh", "dedup_simhash"):
        df = to_df(entry_mod.queries()[name](SF_DIR))
        pairs = set(zip(df.doc_a.astype(int), df.doc_b.astype(int)))
        planted = sum((a + 1_000_000 == b) for a, b in pairs)
        assert planted >= 15, f"{name}: only {planted}/20 planted dups found"


def test_connected_components_transitive():
    import pandas as pd

    from verify_ray.pipelines.dedup import connected_components

    pairs = pd.DataFrame({"doc_a": [1, 2, 10], "doc_b": [2, 3, 11]})
    cc = connected_components(pairs).set_index("doc_id")["group_id"]
    assert cc[1] == cc[2] == cc[3]
    assert cc[10] == cc[11]
    assert cc[1] != cc[10]


def test_flagship_deterministic_across_runs(entry_mod):
    """Verdicts/violations must not depend on execution order
    (SURVEY §7: keyed on lineage, never on scheduling)."""
    a = to_df(entry_mod.queries()["sequences_validate"](SF_DIR))
    b = to_df(entry_mod.queries()["sequences_validate"](SF_DIR))
    pd.testing.assert_frame_equal(a, b)


def test_minhash_deterministic(entry_mod):
    a = to_df(entry_mod.queries()["dedup_minhash_lsh"](SF_DIR))
    b = to_df(entry_mod.queries()["dedup_minhash_lsh"](SF_DIR))
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True))
