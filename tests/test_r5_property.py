"""Randomized differentials for the round-5 operators: naive pure-
pandas/python references (one row / one group at a time) vs the
distributed engine, over seeded random tables with nulls, ties and
degenerate groups — the repo's property-oracle strategy scaled to
Ray-backed operators (seeded loops instead of hypothesis: each example
pays a Ray pipeline, so examples are few but adversarial)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SEEDS = [0, 1, 2, 7, 13]


def _ds(df: pd.DataFrame, blocks: int = 3):
    import ray.data as rd

    return (rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
            .repartition(blocks).materialize())


def _rand_events(rng, n=300, with_value=False):
    df = pd.DataFrame({
        "user_id": rng.integers(0, 12, n).astype("int64"),
        "ts": pd.to_datetime(rng.integers(0, 5000, n), unit="s")
        .astype("datetime64[us]"),
        "event_type": rng.choice(["a", "b", "c"], n),
        "event_id": np.arange(n, dtype="int64")})
    if with_value:
        df["value"] = np.round(rng.normal(0, 50, n), 3)
        df.loc[rng.random(n) < 0.1, "value"] = None
    # nulls in key fields
    df.loc[rng.random(n) < 0.05, "user_id"] = None
    df.loc[rng.random(n) < 0.05, "event_type"] = None
    df["user_id"] = df.user_id.astype("Int64")
    # duplicate timestamps (tie pressure)
    dup = rng.random(n) < 0.3
    df.loc[dup, "ts"] = df.ts.iloc[0]
    return df


@pytest.mark.parametrize("seed", SEEDS)
def test_collapse_repeats_vs_pandas(ray_session, seed):
    from verify_ray.pipelines.sessions import collapse_repeats

    rng = np.random.default_rng(seed)
    df = _rand_events(rng)
    within = 120 * 1_000_000
    got = collapse_repeats(_ds(df), within_us=within, num_buckets=4)

    valid = df.dropna(subset=["user_id", "ts", "event_type"])
    keep = list(df[~df.index.isin(valid.index)].event_id)
    for _, g in valid.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        pt, pts = None, None
        for _, r in g.iterrows():
            gap = ((r.ts - pts).value // 1000 if pts is not None
                   else None)  # ns -> us
            if not (pt == r.event_type and gap is not None
                    and gap <= within):
                keep.append(r.event_id)
            pt, pts = r.event_type, r.ts
    assert list(got.event_id) == sorted(keep)


@pytest.mark.parametrize("seed", SEEDS)
def test_time_weighted_vs_pandas(ray_session, seed):
    from verify_ray.pipelines.sessions import time_weighted_value

    rng = np.random.default_rng(seed)
    df = _rand_events(rng, with_value=True)
    cap = 600 * 1_000_000
    got = time_weighted_value(_ds(df), max_gap_us=cap, num_buckets=4)

    valid = df.dropna(subset=["user_id", "ts", "value"])
    exp = {}
    for uid, g in valid.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = g.ts.astype("int64").to_numpy()  # datetime64[us] -> us
        vm = np.floor(g.value.to_numpy() * 1000.0).astype(np.int64)
        num = den = 0
        for i in range(len(ts) - 1):
            dt = min(int(ts[i + 1] - ts[i]), cap) // 1000
            num += int(vm[i]) * dt
            den += dt
        exp[int(uid)] = (num, den)
    assert len(got) == len(exp)
    for r in got.itertuples():
        assert (int(r.twa_num), int(r.twa_den)) == exp[int(r.user_id)], \
            r.user_id


@pytest.mark.parametrize("seed", SEEDS)
def test_minmax_permille_vs_pandas(ray_session, seed):
    from verify_ray.pipelines.analytics import minmax_permille

    rng = np.random.default_rng(seed)
    n = 200
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "lang": rng.choice(["en", "de", "zz", None], n),
        "n_chars": rng.integers(-50, 5000, n).astype("int64")})
    got = (minmax_permille(_ds(df), "n_chars", "lang", "doc_id")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    grp = df.groupby("lang", dropna=False)["n_chars"]
    lo = grp.transform("min")
    hi = grp.transform("max")
    span = hi - lo
    exp = np.where(span > 0,
                   (df.n_chars - lo) * 1000 // np.maximum(span, 1), 0)
    assert list(got.permille) == [int(x) for x in exp]


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_stopword_discovery_vs_python(ray_session, seed):
    from verify_ray.pipelines.text import stopword_discovery

    rng = np.random.default_rng(seed)
    words = ["w%d" % i for i in range(12)]
    n = 120
    texts = [" ".join(rng.choice(words, size=rng.integers(1, 8)))
             for _ in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                       "text": texts})
    tau = 300
    got = stopword_discovery(_ds(df), min_df_permille=tau)
    from collections import Counter

    dfc = Counter()
    for t in texts:
        for w in set(t.split()):
            dfc[w] += 1
    exp = sorted(((w, c) for w, c in dfc.items()
                  if 1000 * c >= tau * n),
                 key=lambda x: (-x[1], x[0]))
    assert list(map(tuple, got.itertuples(index=False))) == exp
