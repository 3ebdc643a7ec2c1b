"""Mergeable streaming sketches for distribution-drift checks (W3).

The reference only checks scalar membership/bounds
(/root/reference/verify-macros/../macros.rs K3-K8); drift checks
generalize "value within expected set/range" to "distribution within
expected shape" (SURVEY §2.6 W3).  Everything here is:

  * **mergeable** — ``a.merge(b)`` is associative+commutative, so Ray
    can combine per-batch partials in any tree order;
  * **vectorized** — numpy adds whole columns, no Python loops;
  * **deterministic** — fixed hash seeds, no RNG at runtime;
  * **bounded** — O(KB) per sketch regardless of input size.

Sketches: a log-spaced ``HistogramSketch`` for quantiles (plays the
t-digest role with deterministic merge), a ``CountMinSketch`` for
token frequencies, and a ``TokenFreqSketch`` combining count-min with
an exact candidate set for heavy hitters.
"""

from __future__ import annotations

import io
import pickle

import numpy as np


class HistogramSketch:
    """Log-spaced fixed-bin histogram over [0, max_value].

    Quantile error is bounded by bin width (relative error ≈
    ``exp(log1p(max)/bins) - 1``, ~4% for max=2^21 and 384 bins), and
    unlike t-digest the merge is exact: same edges, add counts.
    """

    __slots__ = ("max_value", "bins", "counts", "n", "total")

    def __init__(self, max_value: float = 2**21, bins: int = 384):
        self.max_value = float(max_value)
        self.bins = int(bins)
        self.counts = np.zeros(bins, dtype=np.int64)
        self.n = 0
        self.total = 0.0

    def _edges(self) -> np.ndarray:
        return np.expm1(
            np.linspace(0.0, np.log1p(self.max_value), self.bins + 1)
        )

    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        v = np.clip(v, 0.0, self.max_value)
        pos = np.log1p(v) * (self.bins / np.log1p(self.max_value))
        idx = np.minimum(pos.astype(np.int64), self.bins - 1)
        if weights is None:
            np.add.at(self.counts, idx, 1)
            self.n += len(v)
            self.total += float(v.sum())
        else:
            w = np.asarray(weights, dtype=np.int64)
            np.add.at(self.counts, idx, w)
            self.n += int(w.sum())
            self.total += float((v * w).sum())

    def merge(self, other: "HistogramSketch") -> "HistogramSketch":
        assert self.bins == other.bins and self.max_value == other.max_value
        self.counts += other.counts
        self.n += other.n
        self.total += other.total
        return self

    def quantile(self, q) -> np.ndarray:
        """Interpolated quantile estimate(s) for q in [0, 1]."""
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.n == 0:
            return np.full(len(qs), np.nan)
        cum = np.cumsum(self.counts)
        targets = qs * self.n
        bin_idx = np.searchsorted(cum, targets, side="left")
        bin_idx = np.minimum(bin_idx, self.bins - 1)
        edges = self._edges()
        lo, hi = edges[bin_idx], edges[bin_idx + 1]
        prev = np.where(bin_idx > 0, cum[np.maximum(bin_idx - 1, 0)], 0)
        within = self.counts[bin_idx]
        frac = np.where(within > 0, (targets - prev) / np.maximum(within, 1), 0.5)
        return lo + np.clip(frac, 0, 1) * (hi - lo)

    def cdf(self, values) -> np.ndarray:
        """Approximate P(X <= v) for each v (interpolated within the
        bin) — the KS-side complement of ``quantile``."""
        vs = np.atleast_1d(np.asarray(values, dtype=np.float64))
        if self.n == 0:
            return np.full(len(vs), np.nan)
        edges = self._edges()
        v = np.clip(vs, 0.0, self.max_value)
        pos = np.log1p(v) * (self.bins / np.log1p(self.max_value))
        idx = np.minimum(pos.astype(np.int64), self.bins - 1)
        cum = np.concatenate([[0], np.cumsum(self.counts)])
        lo, hi = edges[idx], edges[idx + 1]
        frac = np.where(hi > lo, (v - lo) / np.maximum(hi - lo, 1e-12), 1.0)
        return (cum[idx] + np.clip(frac, 0, 1) * self.counts[idx]) / self.n

    def mean(self) -> float:
        return self.total / self.n if self.n else float("nan")


class CountMinSketch:
    """Deterministic count-min over non-negative int keys.

    depth×width int64 counters; hashes are classic multiply-shift:
    ``h_d(x) = (a_d * x) >> (64 - log2(width))`` in wrapping uint64
    arithmetic with fixed odd multipliers from a seeded RNG, so two
    independently constructed sketches with the same shape merge
    correctly.  Width must be a power of two.  Point estimate = min
    over rows (classic CM upper bound).
    """

    __slots__ = ("depth", "width", "table", "n", "_a", "_shift")

    def __init__(self, depth: int = 4, width: int = 8192, seed: int = 0x5EED):
        assert width & (width - 1) == 0, "width must be a power of two"
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.n = 0
        rng = np.random.RandomState(seed)
        self._a = (rng.randint(1, 2**62, size=depth).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
        self._shift = np.uint64(64 - int(np.log2(width)))

    def _rows(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64)
        out = np.empty((self.depth, len(keys)), dtype=np.int64)
        with np.errstate(over="ignore"):
            for d in range(self.depth):
                out[d] = ((self._a[d] * k) >> self._shift).astype(np.int64)
        return out

    def add(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        keys = np.asarray(keys)
        if len(keys) == 0:
            return
        # pre-aggregate duplicates so np.add.at touches each key once
        uniq, inv = np.unique(keys, return_inverse=True)
        if counts is None:
            c = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        else:
            c = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(c, inv, np.asarray(counts, dtype=np.int64))
        rows = self._rows(uniq)
        for d in range(self.depth):
            np.add.at(self.table[d], rows[d], c)
        self.n += int(c.sum())

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=np.int64)
        rows = self._rows(keys)
        est = self.table[0][rows[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.table[d][rows[d]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        assert self.depth == other.depth and self.width == other.width
        self.table += other.table
        self.n += other.n
        return self


class TokenFreqSketch:
    """Heavy-hitter token frequencies: count-min for counts + a bounded
    exact candidate set (tokens seen in any batch's top slice) so top-k
    queries don't need to enumerate the key space."""

    __slots__ = ("cm", "candidates", "max_candidates")

    def __init__(self, depth: int = 4, width: int = 8192, max_candidates: int = 4096):
        self.cm = CountMinSketch(depth=depth, width=width)
        self.candidates: dict[int, int] = {}
        self.max_candidates = max_candidates

    def add(self, tokens: np.ndarray) -> None:
        tokens = np.asarray(tokens)
        if len(tokens) == 0:
            return
        uniq, counts = np.unique(tokens, return_counts=True)
        self.cm.add(uniq, counts)
        # keep the batch's heaviest keys as candidates
        if len(uniq) > self.max_candidates // 4:
            top = np.argsort(counts)[-(self.max_candidates // 4):]
            uniq, counts = uniq[top], counts[top]
        for t, c in zip(uniq.tolist(), counts.tolist()):
            self.candidates[t] = self.candidates.get(t, 0) + int(c)
        self._prune()

    def _prune(self) -> None:
        if len(self.candidates) > self.max_candidates:
            items = sorted(self.candidates.items(), key=lambda kv: -kv[1])
            self.candidates = dict(items[: self.max_candidates])

    def merge(self, other: "TokenFreqSketch") -> "TokenFreqSketch":
        self.cm.merge(other.cm)
        for t, c in other.candidates.items():
            self.candidates[t] = self.candidates.get(t, 0) + c
        self._prune()
        return self

    def topk(self, k: int) -> list[tuple[int, float]]:
        """Top-k (token, relative_freq) by count-min estimate over the
        candidate union; frequencies relative to total token count."""
        if not self.candidates or self.cm.n == 0:
            return []
        keys = np.fromiter(self.candidates.keys(), dtype=np.int64)
        est = self.cm.estimate(keys)
        order = np.argsort(-est, kind="stable")[:k]
        total = float(self.cm.n)
        return [(int(keys[i]), float(est[i]) / total) for i in order]


class HyperLogLog:
    """Approximate distinct counting (HLL with 2^p registers).

    Standard estimator with small-range linear counting; deterministic
    multiply-shift hashing; merge = register-wise max.  Used by the
    profiler when a column's cardinality exceeds the exact cap.
    """

    __slots__ = ("p", "m", "registers", "_a")

    def __init__(self, p: int = 12, seed: int = 0xD157):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        rng = np.random.RandomState(seed)
        self._a = (np.uint64(rng.randint(1, 2**62)) << np.uint64(1)) | np.uint64(1)

    def _hash(self, values: np.ndarray) -> np.ndarray:
        if values.dtype.kind in "OUS":  # strings -> stable 64-bit via pandas
            import pandas as pd

            h = pd.util.hash_array(values.astype(object))
        else:
            # splitmix64-style finalizer: HLL needs full avalanche (the
            # rank uses mid/low bits, which a bare multiply leaves biased)
            with np.errstate(over="ignore"):
                h = values.astype(np.uint64) * self._a
                h ^= h >> np.uint64(33)
                h *= np.uint64(0xFF51AFD7ED558CCD)
                h ^= h >> np.uint64(29)
                h *= np.uint64(0xC4CEB9FE1A85EC53)
                h ^= h >> np.uint64(32)
        return h.astype(np.uint64)

    def add(self, values: np.ndarray) -> None:
        values = np.asarray(values)
        if len(values) == 0:
            return
        h = self._hash(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64(1 << (self.p - 1))
        # rank = leading zeros of the remaining bits + 1, vectorized via
        # float64 exponent extraction (exact for the leading-zero count)
        rest_f = rest.astype(np.float64)
        with np.errstate(divide="ignore"):
            lz = 63 - np.floor(np.log2(rest_f)).astype(np.int64)
        rank = np.clip(lz + 1, 1, 64 - self.p).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return raw


class TDigest:
    """Merging t-digest (Dunning & Ertl) — adaptive-precision streaming
    quantiles for UNBOUNDED, sign-free value ranges, where
    ``HistogramSketch`` needs a known non-negative ``max_value``.

    The k1 scale function ``k(q) = δ/(2π)·asin(2q−1)`` concentrates
    centroids at the tails, so extreme-quantile rank error shrinks
    toward the edges.  Compression is sort-based and batch-oriented
    (pure numpy, no per-value Python): deterministic for a given input
    order; merges are associative up to the documented rank-error
    bound (tested), not bit-exact — use HistogramSketch when exact
    merge-order invariance matters more than range-freedom.
    """

    __slots__ = ("delta", "means", "weights", "n", "_buf_v", "_buf_w",
                 "vmin", "vmax")

    def __init__(self, delta: int = 200):
        self.delta = int(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self._buf_v: list = []
        self._buf_w: list = []
        self.vmin = np.inf
        self.vmax = -np.inf

    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if len(v) == 0:
            return
        w = (np.ones(len(v)) if weights is None
             else np.asarray(weights, dtype=np.float64)[: len(v)])
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self._buf_v.append(v)
        self._buf_w.append(w)
        if sum(len(x) for x in self._buf_v) >= 8 * self.delta:
            self._compress()

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2 * np.pi) * np.arcsin(
            np.clip(2 * q - 1, -1.0, 1.0))

    def _compress(self) -> None:
        if self._buf_v:
            m = np.concatenate([self.means] + self._buf_v)
            w = np.concatenate([self.weights] + self._buf_w)
            self._buf_v, self._buf_w = [], []
        else:
            m, w = self.means, self.weights
        if len(m) == 0:
            return
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        # greedy left-to-right merge under the k1 size bound: a cluster
        # may absorb the next point while k(q_right) - k(q_left) <= 1
        q_left = np.concatenate([[0.0], np.cumsum(w)[:-1]]) / total
        k_left = self._k(q_left)
        k_right = self._k((np.cumsum(w)) / total)
        out_m, out_w = [], []
        cur_m, cur_w, cur_k = m[0] * w[0], w[0], k_left[0]
        for i in range(1, len(m)):
            if k_right[i] - cur_k <= 1.0:
                cur_m += m[i] * w[i]
                cur_w += w[i]
            else:
                out_m.append(cur_m / cur_w)
                out_w.append(cur_w)
                cur_m, cur_w, cur_k = m[i] * w[i], w[i], k_left[i]
        out_m.append(cur_m / cur_w)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)
        self.n = float(total)

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        if len(other.means):
            self._buf_v.append(other.means.copy())
            self._buf_w.append(other.weights.copy())
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._compress()
        return self

    def quantile(self, q) -> np.ndarray:
        self._compress()
        qs = np.atleast_1d(np.asarray(q, dtype=np.float64))
        if self.n == 0:
            return np.full(len(qs), np.nan)
        m, w = self.means, self.weights
        # centroid midpoints in cumulative-weight space, with min/max
        # as exact anchors (standard t-digest interpolation)
        cum = np.cumsum(w) - w / 2
        xs = np.concatenate([[0.0], cum, [self.n]])
        ys = np.concatenate([[self.vmin], m, [self.vmax]])
        out = np.interp(qs * self.n, xs, ys)
        return out if np.ndim(q) else np.float64(out[0])

    def cdf(self, values) -> np.ndarray:
        """P(X <= v) — inverse of the quantile interpolation (used by
        the drift KS check)."""
        self._compress()
        vs = np.atleast_1d(np.asarray(values, dtype=np.float64))
        if self.n == 0:
            return np.full(len(vs), np.nan)
        cum = np.cumsum(self.weights) - self.weights / 2
        xs = np.concatenate([[0.0], cum, [self.n]])
        ys = np.concatenate([[self.vmin], self.means, [self.vmax]])
        out = np.interp(vs, ys, xs) / self.n
        return out if np.ndim(values) else np.float64(out[0])


class GroupedSketch:
    """Per-group (source) sketch bundle: a quantile sketch over one
    numeric column + token-frequency sketch over a list column.

    ``quantile_sketch`` picks the family: "histogram" (default —
    exact merge, bounded non-negative domain) or "tdigest" (unbounded
    / signed ranges, tail-adaptive); both expose add/merge/quantile/
    cdf, so the drift stage is agnostic (attr stays named ``hist``).
    """

    __slots__ = ("hist", "tokens", "rows", "kind")

    def __init__(self, max_value: float = 2**21,
                 quantile_sketch: str = "histogram"):
        self.kind = quantile_sketch
        self.hist = (TDigest() if quantile_sketch == "tdigest"
                     else HistogramSketch(max_value=max_value))
        self.tokens = TokenFreqSketch()
        self.rows = 0

    def merge(self, other: "GroupedSketch") -> "GroupedSketch":
        self.hist.merge(other.hist)
        self.tokens.merge(other.tokens)
        self.rows += other.rows
        return self

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        if self.kind == "tdigest":
            self.hist._compress()
            h = ("tdigest", self.hist.delta, self.hist.means,
                 self.hist.weights, self.hist.n, self.hist.vmin,
                 self.hist.vmax)
        else:
            h = (self.hist.max_value, self.hist.bins, self.hist.counts,
                 self.hist.n, self.hist.total)
        pickle.dump(
            {
                "hist": h,
                "cm": (self.tokens.cm.table, self.tokens.cm.n),
                "cand": self.tokens.candidates,
                "rows": self.rows,
            },
            buf, protocol=pickle.HIGHEST_PROTOCOL,
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, b: bytes) -> "GroupedSketch":
        d = pickle.loads(b)
        if d["hist"][0] == "tdigest":
            g = cls(quantile_sketch="tdigest")
            (_tag, g.hist.delta, g.hist.means, g.hist.weights, g.hist.n,
             g.hist.vmin, g.hist.vmax) = d["hist"]
            g.tokens.cm.table = d["cm"][0]
            g.tokens.cm.n = d["cm"][1]
            g.tokens.candidates = d["cand"]
            g.rows = d["rows"]
            return g
        g = cls(max_value=d["hist"][0])
        g.hist.bins = d["hist"][1]
        g.hist.counts = d["hist"][2]
        g.hist.n = d["hist"][3]
        g.hist.total = d["hist"][4]
        g.tokens.cm.table = d["cm"][0]
        g.tokens.cm.n = d["cm"][1]
        g.tokens.candidates = d["cand"]
        g.rows = d["rows"]
        return g
