"""Unit tests for the round-3 text/contamination operators:
repetition signals, regex redaction, benchmark decontamination,
boilerplate n-gram document frequency, and the md5_u64le hash
contract."""

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from verify_ray.functions.hashing import md5_u64le
from verify_ray.pipelines.text import (DEFAULT_PII_PATTERNS,
                                       redact_batch, repetition_batch)


def brute_repetition(text: str):
    words = text.strip().split()
    if not words:
        words = [""]
    wc = Counter(words)
    bigrams = Counter(zip(words, words[1:]))
    return {
        "n_words": len(words),
        "top_word_cnt": max(wc.values()),
        "dup_word_cnt": sum(c for c in wc.values() if c >= 2),
        "top_bigram_cnt": max(bigrams.values()) if bigrams else 0,
    }


def test_repetition_matches_bruteforce():
    texts = [
        "a b a b a", "x", "one two two three three three",
        "  pad  pad ", "solo words only here", "z z z z z z",
        "a b c a b c a b c", "tail a", "a",
    ]
    b = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = repetition_batch(b).to_pandas()
    for i, t in enumerate(texts):
        exp = brute_repetition(t)
        row = out.iloc[i]
        for k, v in exp.items():
            assert row[k] == v, f"doc {i} ({t!r}): {k} {row[k]} != {v}"


def test_repetition_multichunk_and_order():
    # chunked input (concat table) must not change per-row results
    t1 = pa.table({"doc_id": [0, 1], "text": ["a a b", "c d"]})
    t2 = pa.table({"doc_id": [2], "text": ["a a b"]})
    out = repetition_batch(pa.concat_tables([t1, t2])).to_pandas()
    cols = ["n_words", "top_word_cnt", "dup_word_cnt", "top_bigram_cnt"]
    assert out.loc[0, cols].tolist() == out.loc[2, cols].tolist()


def test_redact_sequential_patterns():
    # the email is redacted FIRST, so its digits can't feed the
    # longnum pattern; the IP inside the email is likewise consumed
    b = pa.table({
        "doc_id": [0, 1, 2],
        "text": [
            "mail 4111111111111111@example.com stays one email",
            "bare 4111111111111111 and 10.1.2.3",
            "clean text",
        ],
    })
    out = redact_batch(b).to_pandas()
    assert out.n_email.tolist() == [1, 0, 0]
    assert out.n_ipv4.tolist() == [0, 1, 0]
    assert out.n_longnum.tolist() == [0, 1, 0]
    assert out.text_redacted[0] == "mail [EMAIL] stays one email"
    assert out.text_redacted[1] == "bare [LONGNUM] and [IPV4]"
    assert out.text_redacted[2] == "clean text"


def test_redact_custom_patterns_and_duckdb_parity():
    duckdb = pytest.importorskip("duckdb")
    texts = ["id ABC-12 and ABC-99", "nothing", "ABC-00"]
    b = pa.table({"doc_id": [0, 1, 2], "text": texts})
    out = redact_batch(b, patterns=[("code", r"ABC-\d{2}")]).to_pandas()
    con = duckdb.connect()
    con.register("d", b)
    orc = con.execute(r"""
        SELECT doc_id,
               len(regexp_extract_all(text, 'ABC-\d{2}')) AS n_code,
               regexp_replace(text, 'ABC-\d{2}', '[CODE]', 'g') AS text_redacted
        FROM d ORDER BY doc_id""").fetchdf()
    assert out.n_code.tolist() == orc.n_code.tolist()
    assert out.text_redacted.tolist() == orc.text_redacted.tolist()


def test_default_pii_patterns_are_all_counted():
    b = pa.table({"doc_id": [0],
                  "text": ["x@y.io 1.2.3.4 4111111111111111"]})
    out = redact_batch(b, DEFAULT_PII_PATTERNS).to_pandas()
    assert out.n_email[0] == 1 and out.n_ipv4[0] == 1 and out.n_longnum[0] == 1
    assert out.text_redacted[0] == "[EMAIL] [IPV4] [LONGNUM]"


def test_md5_u64le_contract():
    vals = ["", "abc", "hello world", "ABC-12"]
    got = md5_u64le(vals)
    exp = [int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "little")
           for v in vals]
    assert got.dtype == np.uint64
    assert list(got) == exp


def test_decontaminate_flags_overlap(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.contamination import decontaminate

    bench = rd.from_arrow(pa.table({
        "doc_id": [100],
        "text": ["one two three four five six seven eight nine ten"],
    }))
    target = rd.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [
            # shares the full 10-word span -> 3 distinct 8-grams
            "one two three four five six seven eight nine ten",
            # shares exactly one 8-gram window
            "zz one two three four five six seven eight yy",
            # disjoint
            "a b c d e f g h i j",
        ],
    }))
    out = decontaminate(target, bench, n=8).to_pandas().sort_values("doc_id")
    assert out.doc_id.tolist() == [1, 2]
    assert out.set_index("doc_id").n_overlap.to_dict() == {1: 3, 2: 1}
    assert out.set_index("doc_id").n_grams.to_dict() == {1: 3, 2: 3}


def test_decontaminate_short_docs_no_grams(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.contamination import decontaminate

    bench = rd.from_arrow(pa.table({"doc_id": [0], "text": ["a b c"]}))
    target = rd.from_arrow(pa.table({"doc_id": [1], "text": ["a b c"]}))
    out = decontaminate(target, bench, n=8).to_pandas()
    assert len(out) == 0  # both too short for any 8-gram


def test_common_ngram_stats_df_threshold(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.contamination import common_ngram_stats

    # the gram "x y z" appears in 3 docs; "a b c" in 1
    docs = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["x y z tail0", "x y z tail1", "pre x y z", "a b c"],
    })
    out = common_ngram_stats(rd.from_arrow(docs), n=3, min_docs=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.n_boiler.tolist() == [1, 1, 1, 0]
    assert out.n_grams.tolist() == [2, 2, 2, 1]


def test_common_ngram_stats_distinct_within_doc(ray_session):
    import ray.data as rd

    from verify_ray.pipelines.contamination import common_ngram_stats

    # "r r r r r" contains "r r r" three times but it counts ONCE per
    # doc toward document frequency
    docs = pa.table({
        "doc_id": [0, 1],
        "text": ["r r r r r", "q q q"],
    })
    out = common_ngram_stats(rd.from_arrow(docs), n=3, min_docs=2) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out.n_boiler.tolist() == [0, 0]   # df("r r r") == 1
    assert out.n_grams.tolist() == [1, 1]    # distinct grams per doc
