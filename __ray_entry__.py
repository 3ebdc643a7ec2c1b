"""Driver contract for the verify_ray engine.

The driver calls ``entry()`` (smoke, sf0.001), runs each
``queries()[name](sf_dir)`` at sf0.01 against ``oracle_sql()[name]``
via DuckDB (row-count + schema + order-insensitive value-hash).

Ray is initialised by the driver BEFORE this module is imported —
nothing here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------------------
# flagship pipeline: documents -> tokenize -> sequences -> full validation


SEQUENCES_SPEC = {
    "table": "sequences",
    "key": "doc_id",
    "columns": {
        "doc_id": {"dtype": "string", "non_null": True, "pattern": "^[0-9]+$",
                   "min_length": 1, "max_length": 20, "unique": True},
        "tokens": {"dtype": "list<int32>", "non_null": True,
                   "element_min": 0, "element_max": 49_999,
                   "len_equals": "n_tok"},
        "n_tok": {"dtype": "int32", "non_null": True,
                  "minimum": 20, "maximum": 200},   # flags short/long docs
        "source": {"dtype": "string", "non_null": True,
                   "pattern": "^src[0-9]+$"},
    },
}


def flagship(sf_dir: str) -> pd.DataFrame:
    """documents → hash-tokenize (actor pool) → sequences table of the
    BASELINE input_hint shape → full validation engine (narrow kernels +
    global uniqueness).  Returns the violation rows."""
    from verify_ray.engine import validate
    from verify_ray.pipelines.tokenize import tokenize_documents
    from verify_ray.spec import ConstraintSpec

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    seqs = tokenize_documents(docs, concurrency=2)
    rep = validate(seqs, ConstraintSpec.from_dict(SEQUENCES_SPEC))
    return (rep.violations.select(["doc_id", "rule_id", "span"]).to_pandas()
            .sort_values(["doc_id", "rule_id", "span"]).reset_index(drop=True))


def entry() -> Any:
    return flagship("/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# query catalogue


def _docs_with_near_dups(sf_dir: str):
    """documents ∪ mutated copy of the first 20 docs (deterministic) —
    guarantees the near-dup pipelines have positives to find."""
    import ray.data as rd

    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    head = t.slice(0, 20)
    mutated = pa.table({
        "doc_id": pa.array([i + 1_000_000 for i in
                            head.column("doc_id").to_pylist()], type=pa.int64()),
        "text": pa.array([x + " extra tail" for x in
                          head.column("text").to_pylist()], type=pa.string()),
    })
    return rd.from_arrow(pa.concat_tables([t.select(["doc_id", "text"]), mutated]))


def queries() -> dict[str, Callable[[str], Any]]:
    from verify_ray.pipelines import (analytics, dedup, multimodal, sessions,
                                      similarity, text)
    from verify_ray.pipelines import validation_queries as vq

    def stats_docs_by_lang(sf):
        out = analytics.grouped_stats(
            _read(sf, "documents", columns=["lang", "n_chars"]),
            keys=["lang"], aggs={"n_chars": ["count", "min", "max", "mean"]})
        return pd.DataFrame({
            "lang": out.lang,
            "n_docs": out.n_chars_count.astype("int64"),
            "min_chars": out.n_chars_min.astype("int64"),
            "max_chars": out.n_chars_max.astype("int64"),
            "avg_chars": np.round(out.n_chars_mean, 6),
        })

    def stats_by_lang_source(sf):
        out = analytics.grouped_stats(
            _read(sf, "documents", columns=["lang", "source", "n_chars"]),
            keys=["lang", "source"], aggs={"n_chars": ["count", "mean"]})
        return pd.DataFrame({
            "lang": out.lang, "source": out.source,
            "n_docs": out.n_chars_count.astype("int64"),
            "avg_chars": np.round(out.n_chars_mean, 6),
        })

    def dedup_exact(sf):
        g = dedup.exact_dedup_groups(_read(sf, "documents",
                                           columns=["doc_id", "text"]))
        df = g.to_pandas().sort_values("content_hash").reset_index(drop=True)
        return df[["content_hash", "keep_id", "n"]]

    def dedup_exact_dups(sf):
        # documents ∪ id-shifted copy: every text is an exact-dup group
        # of 2; both sides construct the union identically
        import ray.data as rd

        t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"])
        shifted = pa.table({
            "doc_id": pa.array([i + 1_000_000 for i in
                                t.column("doc_id").to_pylist()], type=pa.int64()),
            "text": t.column("text"),
        })
        ds = rd.from_arrow(pa.concat_tables([t, shifted]))
        g = dedup.exact_dedup_groups(ds)
        df = g.to_pandas().sort_values("content_hash").reset_index(drop=True)
        return df[["content_hash", "keep_id", "n"]]

    def dedup_groups(sf):
        # transitive near-dup components from minhash candidate pairs
        pairs = dedup.minhash_lsh_pairs(_docs_with_near_dups(sf), threshold=0.6)
        return dedup.connected_components(pairs)

    def token_count(sf):
        return (text.token_counts(_read(sf, "documents",
                                        columns=["doc_id", "text"]))
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    def fingerprint(sf):
        df = (text.fingerprints(_read(sf, "documents",
                                      columns=["doc_id", "text"]))
              .to_pandas().sort_values("doc_id").reset_index(drop=True))
        return df[["doc_id", "fingerprint"]]

    def ann(sf):
        # sim values are dropped from the compared result: DuckDB's
        # list_cosine_similarity computes in float32, ours in float64 —
        # the top-k SETS agree, the 8th decimal doesn't
        emb = pq.read_table(f"{sf}/embeddings.parquet")
        qmat = np.stack(emb.column("embedding").to_pylist()[:5]).astype(np.float64)
        qids = emb.column("vec_id").to_pylist()[:5]
        out = similarity.ann_topk(_read(sf, "embeddings"),
                                  qmat, k=10, query_ids=qids)
        return out[["query_id", "vec_id"]]

    def near_dup_embeddings(sf):
        out = similarity.embedding_near_dup_exact(_read(sf, "embeddings"),
                                                  tau=0.4)
        return out[["doc_a", "doc_b"]]

    def events_window(sf):
        return analytics.windowed_events(_read(sf, "events"), window="day")

    def topcust(sf):
        return analytics.top_customers(_read(sf, "orders"), k=10)

    def segment_revenue(sf):
        cust = pq.read_table(f"{sf}/customer.parquet")
        return analytics.revenue_by_segment(_read(sf, "orders"), cust)

    def region_revenue(sf):
        return analytics.revenue_by_region(
            _read(sf, "orders"),
            pq.read_table(f"{sf}/customer.parquet"),
            pq.read_table(f"{sf}/nation.parquet"),
            pq.read_table(f"{sf}/region.parquet"))

    def events_orphan_users(sf):
        # present-set restricted to custkey < 100 so the anti-join is
        # non-trivial (testdata user_ids all exist in customer)
        cust = pq.read_table(f"{sf}/customer.parquet", columns=["c_custkey"])
        present = [k for k in cust.column("c_custkey").to_pylist() if k < 100]
        return analytics.anti_join_keys(
            _read(sf, "events", columns=["user_id"]), "user_id", present)

    def infer_docs_spec(sf):
        # derive-from-data (D2 analogue): inferred spec rendered as rows
        from verify_ray.pipelines.profile import infer_spec

        spec = infer_spec(_read(sf, "documents"), key="doc_id")
        rows = [{
            "column": c.name, "dtype": c.dtype or "",
            "non_null": bool(c.non_null),
            "minimum": float(c.minimum) if c.minimum is not None else None,
            "maximum": float(c.maximum) if c.maximum is not None else None,
            "enum": ",".join(c.enum) if c.enum else "",
        } for c in sorted(spec.columns, key=lambda c: c.name)]
        return pd.DataFrame(rows)

    def profile_docs(sf):
        from verify_ray.pipelines.profile import profile

        prof = profile(_read(sf, "documents"))
        return prof[["column", "n", "nulls", "min", "max", "n_distinct"]]

    def media_meta(sf):
        df = (multimodal.media_features(_read(sf, "documents",
                                              columns=["doc_id", "text"]))
              .to_pandas())
        return (df[["doc_id", "media_type", "n_bytes", "checksum"]]
                .sort_values("doc_id").reset_index(drop=True))

    # ---- rows-only (non-SQL-expressible) ----

    def minhash(sf):
        return dedup.minhash_lsh_pairs(_docs_with_near_dups(sf), threshold=0.6)

    def simhash(sf):
        return dedup.simhash_pairs(_docs_with_near_dups(sf), max_hamming=6)

    def ngram_jaccard_planted(sf):
        # exact word-3-gram Jaccard for the deterministic planted pairs
        # (doc, doc+1M with ' extra tail' appended) — SQL-checkable
        ds = _docs_with_near_dups(sf)
        t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
        ids = t.column("doc_id").to_pylist()[:20]
        cand = pd.DataFrame({"doc_a": ids,
                             "doc_b": [i + 1_000_000 for i in ids]})
        out = dedup.ngram_jaccard_pairs(ds, cand)
        out["jaccard"] = np.round(out["jaccard"], 6)
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    def ngram_jaccard(sf):
        ds = _docs_with_near_dups(sf)
        cand = dedup.minhash_lsh_pairs(ds, threshold=0.5)
        out = dedup.ngram_jaccard_pairs(ds, cand)
        out["jaccard"] = np.round(out["jaccard"], 6)
        return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)

    def near_dup_lsh(sf):
        return similarity.embedding_near_dup_lsh(_read(sf, "embeddings"),
                                                 tau=0.4)

    def langid(sf):
        return (text.lang_id(_read(sf, "documents", columns=["doc_id", "text"]),
                             concurrency=2)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    def quality(sf):
        return (text.quality_scores(_read(sf, "documents",
                                          columns=["doc_id", "text"]))
                .to_pandas().sort_values("doc_id").reset_index(drop=True))

    def token_topk(sf):
        # per-source heavy-hitter token ids over the tokenized sequences
        # (count-min + candidate set; deterministic)
        from verify_ray.pipelines.tokenize import tokenize_documents
        from verify_ray.spec import DriftSpec
        from verify_ray.stages.drift import compute_group_sketches

        docs = _read(sf, "documents", columns=["doc_id", "text", "source"])
        seqs = tokenize_documents(docs, concurrency=2).materialize()
        drift = DriftSpec(group_by="source", column="n_tok",
                          token_column="tokens")
        sketches = compute_group_sketches(seqs, drift)
        rows = []
        for src in sorted(sketches):
            for rank, (tok, freq) in enumerate(sketches[src].tokens.topk(10)):
                rows.append({"source": src, "rank": rank, "token": tok,
                             "freq": round(freq, 6)})
        return pd.DataFrame(rows)

    def lsh_ann(sf):
        emb = pq.read_table(f"{sf}/embeddings.parquet")
        qmat = np.stack(emb.column("embedding").to_pylist()[:5]).astype(np.float64)
        qids = emb.column("vec_id").to_pylist()[:5]
        return similarity.lsh_ann_topk(_read(sf, "embeddings"), qmat, k=10,
                                       query_ids=qids)

    return {
        # validation engine vs SQL oracle
        "validate_documents": vq.validate_documents,
        "validate_orders": vq.validate_orders,
        "validate_lineitem": vq.validate_lineitem,
        "validate_events": vq.validate_events,
        "validate_part": vq.validate_part,
        "validate_nested": vq.validate_nested,
        "validate_tagged": vq.validate_tagged,
        "events_sessionize": lambda sf: sessions.sessionize(
            _read(sf, "events"), gap_minutes=30),
        # analytics
        "stats_docs_by_lang": stats_docs_by_lang,
        "stats_by_lang_source": stats_by_lang_source,
        "pricing_summary": lambda sf: analytics.pricing_summary(
            _read(sf, "lineitem")),
        "events_window_day": events_window,
        "top_customers": topcust,
        "top_lineitems": lambda sf: analytics.top_lineitems(
            _read(sf, "lineitem")),
        "revenue_by_segment": segment_revenue,
        "revenue_by_region": region_revenue,
        "events_orphan_users": events_orphan_users,
        # dedup / similarity / text / multimodal
        "dedup_exact": dedup_exact,
        "dedup_exact_dups": dedup_exact_dups,
        "dedup_groups": dedup_groups,
        "dedup_ngram_jaccard_planted": ngram_jaccard_planted,
        "text_token_count": token_count,
        "text_fingerprint": fingerprint,
        "ann_topk": ann,
        "embedding_near_dup": near_dup_embeddings,
        "media_metadata": media_meta,
        "profile_documents": profile_docs,
        # rows-only
        "sequences_validate": flagship,
        "dedup_minhash_lsh": minhash,
        "dedup_simhash": simhash,
        "dedup_ngram_jaccard": ngram_jaccard,
        "embedding_near_dup_lsh": near_dup_lsh,
        "text_langid": langid,
        "text_quality": quality,
        "ann_topk_lsh": lsh_ann,
        "token_topk_by_source": token_topk,
        "infer_documents_spec": infer_docs_spec,
    }


def _sessions_oracle() -> str:
    from verify_ray.pipelines.sessions import SESSIONS_ORACLE_TEMPLATE

    return SESSIONS_ORACLE_TEMPLATE.format(gap_minutes=30)


def oracle_sql() -> dict[str, str]:
    from verify_ray.pipelines import validation_queries as vq

    return {
        "validate_documents": vq.DOCUMENTS_ORACLE,
        "validate_orders": vq.ORDERS_ORACLE,
        "validate_lineitem": vq.LINEITEM_ORACLE,
        "validate_events": vq.EVENTS_ORACLE,
        "validate_part": vq.PART_ORACLE,
        "validate_nested": vq.NESTED_ORACLE,
        "validate_tagged": vq.TAGGED_ORACLE,
        "events_sessionize": _sessions_oracle(),
        "stats_docs_by_lang": """
            SELECT lang, COUNT(*) AS n_docs,
                   MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
                   ROUND(AVG(n_chars), 6) AS avg_chars
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "stats_by_lang_source": """
            SELECT lang, source, COUNT(*) AS n_docs,
                   ROUND(AVG(n_chars), 6) AS avg_chars
            FROM documents GROUP BY lang, source ORDER BY lang, source
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   SUM(l_quantity) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty,
                   ROUND(SUM(l_extendedprice) / COUNT(*), 6) AS avg_price,
                   ROUND(SUM(l_discount) / COUNT(*), 6) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "events_window_day": """
            SELECT event_type, date_trunc('day', ts) AS window_start,
                   COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "top_lineitems": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(l_extendedprice, 2) AS l_extendedprice
            FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
            LIMIT 20
        """,
        "top_customers": """
            SELECT o_custkey, COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS total_value
            FROM orders GROUP BY o_custkey
            ORDER BY total_value DESC, o_custkey LIMIT 10
        """,
        "revenue_by_segment": """
            SELECT c.c_mktsegment, COUNT(*) AS n_orders,
                   ROUND(SUM(o.o_totalprice), 2) AS revenue
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
        """,
        "revenue_by_region": """
            SELECT r.r_name, COUNT(*) AS n_orders,
                   ROUND(SUM(o.o_totalprice), 2) AS revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name ORDER BY r.r_name
        """,
        "events_orphan_users": """
            SELECT DISTINCT user_id FROM events
            WHERE user_id NOT IN
                  (SELECT c_custkey FROM customer WHERE c_custkey < 100)
            ORDER BY user_id
        """,
        "dedup_exact": """
            SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
                   COUNT(*) AS n
            FROM documents GROUP BY md5(text) ORDER BY content_hash
        """,
        "dedup_exact_dups": """
            WITH docs2 AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text FROM documents
            )
            SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
                   COUNT(*) AS n
            FROM docs2 GROUP BY md5(text) ORDER BY content_hash
        """,
        "dedup_ngram_jaccard_planted": """
            WITH docs2(doc_id, text) AS (
              SELECT doc_id, text FROM documents WHERE doc_id < 20
              UNION ALL
              SELECT doc_id + 1000000, text || ' extra tail'
              FROM documents WHERE doc_id < 20
            ),
            sh AS (
              SELECT doc_id,
                     list_distinct(list_transform(
                         range(1, greatest(len(w) - 1, 2)),
                         i -> list_aggregate(w[i:i+2], 'string_agg', ' '))) AS s
              FROM (SELECT doc_id, string_split(text, ' ') AS w FROM docs2)
            )
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
            FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1000000
            ORDER BY doc_a
        """,
        "text_token_count": """
            SELECT doc_id, len(string_split(trim(text), ' ')) AS n_tok
            FROM documents ORDER BY doc_id
        """,
        "text_fingerprint": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents ORDER BY doc_id
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                         FROM embeddings WHERE vec_id < 5),
                 s AS (SELECT q.query_id, e.vec_id,
                              list_cosine_similarity(q.qe, e.embedding) AS sim_raw
                         FROM q CROSS JOIN embeddings e),
                 r AS (SELECT query_id, vec_id, sim_raw,
                              ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim_raw DESC, vec_id) AS rk
                         FROM s)
            SELECT query_id, vec_id
            FROM r WHERE rk <= 10 ORDER BY query_id, sim_raw DESC, vec_id
        """,
        "embedding_near_dup": """
            SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
            ORDER BY doc_a, doc_b
        """,
        "profile_documents": """
            SELECT 'doc_id' AS "column", COUNT(*) AS n,
                   COUNT(*) - COUNT(doc_id) AS nulls,
                   CAST(MIN(doc_id) AS DOUBLE) AS "min",
                   CAST(MAX(doc_id) AS DOUBLE) AS "max",
                   COUNT(DISTINCT doc_id) AS n_distinct FROM documents
            UNION ALL
            SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), NULL, NULL,
                   COUNT(DISTINCT lang) FROM documents
            UNION ALL
            SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
                   CAST(MIN(n_chars) AS DOUBLE), CAST(MAX(n_chars) AS DOUBLE),
                   COUNT(DISTINCT n_chars) FROM documents
            UNION ALL
            SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), NULL, NULL,
                   COUNT(DISTINCT source) FROM documents
            UNION ALL
            SELECT 'text', COUNT(*), COUNT(*) - COUNT(text), NULL, NULL,
                   COUNT(DISTINCT text) FROM documents
            ORDER BY "column"
        """,
        "media_metadata": """
            SELECT doc_id,
                   CASE WHEN doc_id % 2 = 0 THEN 'image/png'
                        ELSE 'audio/wav' END AS media_type,
                   octet_length(CAST(text AS BLOB)) AS n_bytes,
                   md5(text) AS checksum
            FROM documents ORDER BY doc_id
        """,
    }
