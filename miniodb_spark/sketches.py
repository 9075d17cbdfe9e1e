"""Approximate aggregation: the mergeable sketch registry —
HyperLogLog (cardinality), CountMinSketch (frequency), Misra-Gries
(heavy hitters / top-k), QuantileDigest (quantiles).

Parity target: the reference's ApproximateQueryEngine
(/root/reference/internal/query/approximation.go:13-456) — per
(table, column) HLL and CMS sketches, mergeable, with the same
parameter envelope (HLL precision 4-16 default 12 ⇒ m=4096, err ≈
1.04/√m; CMS width 1000 × depth 5).

For ad-hoc SQL, Spark's built-ins (``approx_count_distinct`` = HLL++,
``count_min_sketch``) already cover the query path. This module exists
for the *registry* semantics the reference adds on top: persistent,
incrementally-mergeable sketches maintained outside any single query.

Distributed build: values are hashed JVM-side (``xxhash64``), then
``mapInPandas`` reduces each partition to one serialized partial
sketch (numpy-vectorized); the driver merges the partials. Data moved
to Python is ~one sketch per partition, never rows.
"""

from __future__ import annotations

import json
import math
import threading
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# HyperLogLog (standard small/large-range corrected estimator)
# ---------------------------------------------------------------------------


class HyperLogLog:
    def __init__(self, precision: int = 12):
        if not 4 <= precision <= 16:
            raise ValueError("precision must be in [4,16]")
        self.p = precision
        self.m = 1 << precision
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Bulk-add 64-bit hashes (vectorized)."""
        h = hashes.astype(np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of `rest` + 1, capped at 64-p+1
        # count leading zeros via bit_length: lz = 64 - bit_length
        bl = np.zeros(len(rest), dtype=np.int64)
        r = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = r >= (np.uint64(1) << np.uint64(shift))
            bl[mask] += shift
            r[mask] >>= np.uint64(shift)
        bl += 1  # bit_length of remaining 1 bit
        rank = (64 - bl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("precision mismatch")
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m) if self.m >= 128 else (
            0.673 if self.m == 16 else 0.697 if self.m == 32 else 0.709
        )
        inv_sum = np.sum(np.exp2(-self.registers.astype(np.float64)))
        raw = alpha * m * m / inv_sum
        if raw <= 2.5 * m:  # small-range: linear counting
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * math.log(m / zeros)
        elif raw > (1 << 32) / 30.0:  # large-range correction
            return -((1 << 32)) * math.log(1 - raw / (1 << 32))
        return raw

    @property
    def error_bound(self) -> float:
        return 1.04 / math.sqrt(self.m)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        hll = cls(b[0])
        hll.registers = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return hll


# ---------------------------------------------------------------------------
# CountMinSketch (seeded 2-universal hashes over a 64-bit value hash)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class CountMinSketch:
    def __init__(self, width: int = 1000, depth: int = 5, seed: int = 1):
        self.width = width
        self.depth = depth
        self.seed = seed
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=depth, dtype=np.int64)
        self.b = rng.randint(0, _MERSENNE, size=depth, dtype=np.int64)
        self.table = np.zeros((depth, width), dtype=np.int64)
        self.total = 0

    def _rows_cols(self, hashes: np.ndarray) -> np.ndarray:
        h = (hashes.astype(np.uint64) & np.uint64((1 << 61) - 1)).astype(np.int64)
        cols = np.empty((self.depth, len(h)), dtype=np.int64)
        for d in range(self.depth):
            cols[d] = ((self.a[d] * h + self.b[d]) % _MERSENNE) % self.width
        return cols

    def add_hashes(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        if counts is None:
            counts = np.ones(len(hashes), dtype=np.int64)
        cols = self._rows_cols(hashes)
        for d in range(self.depth):
            np.add.at(self.table[d], cols[d], counts)
        self.total += int(counts.sum())

    def query_hash(self, h: int) -> int:
        # accept signed (xxhash64) or unsigned 64-bit values; numpy is
        # deprecating out-of-bound uint64 conversion, so normalize first
        hv = int(h) & ((1 << 64) - 1)
        if hv >= 1 << 63:
            hv -= 1 << 64
        cols = self._rows_cols(np.array([hv], dtype=np.int64).view(np.uint64))
        return int(min(self.table[d, cols[d, 0]] for d in range(self.depth)))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.width, self.depth, self.seed) != (other.width, other.depth, other.seed):
            raise ValueError("sketch shape/seed mismatch")
        self.table += other.table
        self.total += other.total
        return self

    @property
    def epsilon(self) -> float:
        return math.e / self.width

    def to_bytes(self) -> bytes:
        header = json.dumps(
            {"w": self.width, "d": self.depth, "s": self.seed, "t": self.total}
        ).encode()
        return len(header).to_bytes(4, "big") + header + self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMinSketch":
        n = int.from_bytes(b[:4], "big")
        meta = json.loads(b[4 : 4 + n])
        cms = cls(meta["w"], meta["d"], meta["s"])
        cms.total = meta["t"]
        cms.table = (
            np.frombuffer(b[4 + n :], dtype=np.int64)
            .reshape(meta["d"], meta["w"])
            .copy()
        )
        return cms


# ---------------------------------------------------------------------------
# distributed builders
# ---------------------------------------------------------------------------

_PARTIAL_SCHEMA = T.StructType([T.StructField("sketch", T.BinaryType(), False)])


def _update_hll_batch(hll: "HyperLogLog", h_series) -> None:
    hll.add_hashes(h_series.to_numpy(dtype=np.int64).view(np.uint64))


def _update_cms_batch(cms: "CountMinSketch", h_series) -> None:
    vals, counts = np.unique(
        h_series.to_numpy(dtype=np.int64).view(np.uint64), return_counts=True
    )
    cms.add_hashes(vals, counts.astype(np.int64))


def _update_mg_batch(mg: "MisraGries", v_series) -> None:
    vc = v_series.value_counts()
    mg.add_values(vc.index.tolist(), vc.to_numpy())


def _update_qd_batch(qd: "QuantileDigest", v_series) -> None:
    qd.add_values(v_series.to_numpy(dtype=np.float64))


def build_hll(df: DataFrame, column: str, precision: int = 12) -> HyperLogLog:
    """One partial HLL per partition (mapInPandas), merged on the driver."""
    hashed = df.select(F.xxhash64(F.col(column).cast("string")).alias("h")).filter(
        F.col(column).isNotNull()
    )

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hll = HyperLogLog(precision)
        for pdf in batches:
            _update_hll_batch(hll, pdf["h"])
        yield pd.DataFrame({"sketch": [hll.to_bytes()]})

    merged = HyperLogLog(precision)
    for row in hashed.mapInPandas(_partial, _PARTIAL_SCHEMA).collect():
        merged.merge(HyperLogLog.from_bytes(row["sketch"]))
    return merged


def build_cms(
    df: DataFrame, column: str, width: int = 1000, depth: int = 5, seed: int = 1
) -> CountMinSketch:
    """Partial CMS per partition; pre-aggregated map-side by value hash."""
    hashed = (
        df.filter(F.col(column).isNotNull())
        .select(F.xxhash64(F.col(column).cast("string")).alias("h"))
    )

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cms = CountMinSketch(width, depth, seed)
        for pdf in batches:
            _update_cms_batch(cms, pdf["h"])
        yield pd.DataFrame({"sketch": [cms.to_bytes()]})

    merged = CountMinSketch(width, depth, seed)
    for row in hashed.mapInPandas(_partial, _PARTIAL_SCHEMA).collect():
        merged.merge(CountMinSketch.from_bytes(row["sketch"]))
    return merged


class MisraGries:
    """Misra-Gries heavy-hitters summary (Misra & Gries 1982; the
    SpaceSaving/MG family every streaming top-k uses): at most ``k``
    (value, count) counters; every stored count UNDERESTIMATES the true
    frequency by at most the total decrement ``D``, and any value absent
    from the summary has true count <= D, with D <= N/(k+1). Merging two
    summaries (combine + prune back to k) preserves the bound with
    D = D1 + D2 + prune-decrement, tracked exactly in ``decrements`` so
    callers can assert the guarantee instead of trusting it.

    Completes the mergeable-sketch registry next to HyperLogLog and
    CountMinSketch (reference approximation surface:
    /root/reference/internal/query/approximation.go — HLL/CMS only; MG
    extends it with deterministic top-k candidates CMS cannot give
    without a candidate stream)."""

    def __init__(self, k: int = 32):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.counters: dict[str, int] = {}
        self.decrements = 0
        self.total = 0

    def add_values(self, values, counts) -> None:
        # keys are coerced to str so a to_bytes/from_bytes round-trip
        # (JSON object keys are always strings) preserves identity —
        # otherwise 5 and "5" would double-count after reload
        for v, c in zip(values, counts):
            v = str(v)
            c = int(c)
            self.total += c
            self.counters[v] = self.counters.get(v, 0) + c
        self._prune()

    def _prune(self) -> None:
        if len(self.counters) <= self.k:
            return
        # decrement everything by the (k+1)-th largest count and drop
        # the non-positive rest — the batch form of MG's decrement step
        cs = sorted(self.counters.values(), reverse=True)
        d = cs[self.k]
        self.decrements += d
        self.counters = {
            v: c - d for v, c in self.counters.items() if c - d > 0
        }

    def merge(self, other: "MisraGries") -> None:
        if other.k != self.k:
            raise ValueError("cannot merge MG summaries of different k")
        for v, c in other.counters.items():
            self.counters[v] = self.counters.get(v, 0) + c
        self.total += other.total
        self.decrements += other.decrements
        self._prune()

    def to_bytes(self) -> bytes:
        import json

        return json.dumps(
            {"k": self.k, "c": self.counters, "d": self.decrements,
             "n": self.total},
            sort_keys=True,
        ).encode()

    @classmethod
    def from_bytes(cls, b: bytes) -> "MisraGries":
        import json

        o = json.loads(b.decode())
        mg = cls(o["k"])
        mg.counters = {str(v): int(c) for v, c in o["c"].items()}
        mg.decrements = int(o["d"])
        mg.total = int(o["n"])
        return mg


def build_mg(df: DataFrame, column: str, k: int = 32) -> MisraGries:
    """One partial MG per partition (value counts pre-aggregated inside
    each Arrow batch), merged on the driver — same partials shape as
    the HLL/CMS builders; data moved to Python is one k-entry summary
    per partition, never rows."""

    vals = df.filter(F.col(column).isNotNull()).select(
        F.col(column).cast("string").alias("v")
    )

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mg = MisraGries(k)
        for pdf in batches:
            _update_mg_batch(mg, pdf["v"])
        yield pd.DataFrame({"sketch": [mg.to_bytes()]})

    merged = MisraGries(k)
    for row in vals.mapInPandas(_partial, _PARTIAL_SCHEMA).collect():
        merged.merge(MisraGries.from_bytes(row["sketch"]))
    return merged


class QuantileDigest:
    """Mergeable quantile summary: mean-sorted centroids
    (mean, weight, min, max) with a UNIFORM weight cap of
    ``2*total/max_centroids`` — the equal-weight simplification of the
    t-digest (Dunning & Ertl, "Computing extremely accurate quantiles
    using t-digests", arXiv:1902.04023; uniform cap = their k0 scale
    function). Deterministic — sort + greedy accumulation, no
    randomness — so two engines building from the same values agree.

    Accuracy contract, stated honestly: the POINT estimate from
    ``quantile(q)`` is heuristic (after merging partials, centroid
    member-rank ranges can interleave, so no per-centroid-mass error
    proof survives — this is true of t-digest generally). What IS
    provable is the per-centroid [min, max] containment, which yields
    ``rank_bracket(v)``: sound lower/upper bounds on count(<= v)/N.
    Two guarantees hold by construction and are what the self-checks
    assert: (1) count(<= v) lies inside ``rank_bracket(v)``;
    (2) for est = quantile(q), ``strict_lb - w_max/2N <= q <= ub``,
    where strict_lb uses ``rank_bracket(est, strict=True)`` — under
    ties the non-strict lower bound counts tied centroids BEYOND the
    walk's landing point, so only the strict form is provable (a
    centroid with max < est has mean <= max < est and therefore
    precedes the landing centroid in mean order).

    Completes the mergeable-sketch registry: HLL (cardinality), CMS
    (frequency), MG (top-k), QuantileDigest (quantiles)."""

    def __init__(self, max_centroids: int = 100):
        if max_centroids < 2:
            raise ValueError("max_centroids must be >= 2")
        self.max_centroids = max_centroids
        self.means: list[float] = []
        self.weights: list[int] = []
        self.mins: list[float] = []
        self.maxs: list[float] = []
        self.total = 0
        self.vmin = float("inf")
        self.vmax = float("-inf")

    def add_values(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64)
        vals = vals[~np.isnan(vals)]
        if vals.size == 0:
            return
        self.vmin = min(self.vmin, float(vals.min()))
        self.vmax = max(self.vmax, float(vals.max()))
        self.total += int(vals.size)
        vals.sort()
        vl = vals.tolist()
        self._absorb(vl, [1] * vals.size, vl, vl)

    def merge(self, other: "QuantileDigest") -> None:
        if other.total == 0:
            return
        self.total += other.total
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._absorb(other.means, other.weights, other.mins, other.maxs)

    def _absorb(self, means, weights, mins, maxs) -> None:
        merged = sorted(
            zip(self.means + list(means), self.weights + list(weights),
                self.mins + list(mins), self.maxs + list(maxs))
        )
        cap = max(1, (2 * self.total) // self.max_centroids)
        out_m, out_w, out_lo, out_hi = [], [], [], []
        for m, w, lo, hi in merged:
            if out_w and out_w[-1] + w <= cap:
                tw = out_w[-1] + w
                out_m[-1] = (out_m[-1] * out_w[-1] + m * w) / tw
                out_w[-1] = tw
                out_lo[-1] = min(out_lo[-1], lo)
                out_hi[-1] = max(out_hi[-1], hi)
            else:
                out_m.append(float(m))
                out_w.append(int(w))
                out_lo.append(float(lo))
                out_hi.append(float(hi))
        self.means, self.weights = out_m, out_w
        self.mins, self.maxs = out_lo, out_hi

    def rank_bracket(self, v: float, strict: bool = False) -> tuple[float, float]:
        """PROVABLE bounds on count(<= v) / N (or count(< v) / N with
        ``strict=True``): every member of centroid i lies in
        [min_i, max_i], so centroids entirely below v count fully and
        centroids entirely above not at all. Wide brackets are
        truthful — heavy ties make the quantile genuinely set-valued."""
        if self.total == 0:
            raise ValueError("empty digest")
        if strict:
            lb = sum(w for w, hi in zip(self.weights, self.maxs) if hi < v)
            ub = sum(w for w, lo in zip(self.weights, self.mins) if lo < v)
        else:
            lb = sum(w for w, hi in zip(self.weights, self.maxs) if hi <= v)
            ub = sum(w for w, lo in zip(self.weights, self.mins) if lo <= v)
        return lb / self.total, ub / self.total

    def rank_error_bound(self) -> float:
        """Heuristic compactness indicator (largest centroid's mass
        fraction) — NOT a proven error bound for merged digests; use
        ``rank_bracket`` for sound guarantees."""
        if self.total == 0:
            return 0.0
        return max(self.weights) / self.total

    def quantile(self, q: float) -> float:
        """Value estimate at quantile q via cumulative-weight walk with
        midpoint attribution (each centroid's mass centered on its
        mean). Heuristic point estimate — see the class docstring for
        the provable bracket guarantees around it."""
        if not 0 <= q <= 1:
            raise ValueError("q must be in [0, 1]")
        if self.total == 0:
            raise ValueError("empty digest")
        target = q * self.total
        cum = 0.0
        for m, w in zip(self.means, self.weights):
            if cum + w / 2 >= target:
                return m
            cum += w
        return self.vmax

    def to_bytes(self) -> bytes:
        import json

        return json.dumps(
            {"k": self.max_centroids, "m": self.means, "w": self.weights,
             "cl": self.mins, "ch": self.maxs,
             "n": self.total, "lo": self.vmin, "hi": self.vmax},
        ).encode()

    @classmethod
    def from_bytes(cls, b: bytes) -> "QuantileDigest":
        import json

        o = json.loads(b.decode())
        qd = cls(o["k"])
        qd.means = [float(x) for x in o["m"]]
        qd.weights = [int(x) for x in o["w"]]
        qd.mins = [float(x) for x in o["cl"]]
        qd.maxs = [float(x) for x in o["ch"]]
        qd.total = int(o["n"])
        qd.vmin, qd.vmax = float(o["lo"]), float(o["hi"])
        return qd


def build_qdigest(df: DataFrame, column: str,
                  max_centroids: int = 100) -> QuantileDigest:
    """One partial digest per partition, merged on the driver — the
    HLL/CMS/MG partials shape; rows never leave the executors."""

    vals = df.filter(F.col(column).isNotNull()).select(
        F.col(column).cast("double").alias("v")
    )

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qd = QuantileDigest(max_centroids)
        for pdf in batches:
            _update_qd_batch(qd, pdf["v"])
        yield pd.DataFrame({"sketch": [qd.to_bytes()]})

    merged = QuantileDigest(max_centroids)
    for row in vals.mapInPandas(_partial, _PARTIAL_SCHEMA).collect():
        merged.merge(QuantileDigest.from_bytes(row["sketch"]))
    return merged


def build_all_sketches(
    df: DataFrame,
    column: str,
    precision: int = 12,
    cms_width: int = 1000,
    cms_depth: int = 5,
    mg_k: int = 32,
    max_centroids: int = 100,
):
    """ONE pass building every registry sketch for a column: each
    partition emits a single row carrying all partial sketches (hll,
    cms, mg, and qd when the column is numeric), merged on the driver.
    ``update_from_dataframe`` previously ran one full Spark job per
    sketch kind (3-4 scans of the column per refresh); this folds them
    into one scan. Returns ``(hll, cms, mg, qd_or_None)``."""
    dtype = dict(df.dtypes).get(column, "")
    numeric = dtype in (
        "int", "bigint", "double", "float", "smallint", "tinyint",
    ) or dtype.startswith("decimal")
    cols = [
        F.xxhash64(F.col(column).cast("string")).alias("h"),
        F.col(column).cast("string").alias("vs"),
    ]
    if numeric:
        cols.append(F.col(column).cast("double").alias("vn"))
    base = df.filter(F.col(column).isNotNull()).select(*cols)

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hll = HyperLogLog(precision)
        cms = CountMinSketch(cms_width, cms_depth)
        mg = MisraGries(mg_k)
        qd = QuantileDigest(max_centroids) if numeric else None
        for pdf in batches:
            _update_hll_batch(hll, pdf["h"])
            _update_cms_batch(cms, pdf["h"])
            _update_mg_batch(mg, pdf["vs"])
            if qd is not None:
                _update_qd_batch(qd, pdf["vn"])
        yield pd.DataFrame(
            {
                "hll": [hll.to_bytes()],
                "cms": [cms.to_bytes()],
                "mg": [mg.to_bytes()],
                "qd": [qd.to_bytes() if qd is not None else None],
            }
        )

    m_hll = HyperLogLog(precision)
    m_cms = CountMinSketch(cms_width, cms_depth)
    m_mg = MisraGries(mg_k)
    m_qd = QuantileDigest(max_centroids) if numeric else None
    for row in base.mapInPandas(
        _partial, "hll binary, cms binary, mg binary, qd binary"
    ).collect():
        m_hll.merge(HyperLogLog.from_bytes(row["hll"]))
        m_cms.merge(CountMinSketch.from_bytes(row["cms"]))
        m_mg.merge(MisraGries.from_bytes(row["mg"]))
        if m_qd is not None and row["qd"] is not None:
            m_qd.merge(QuantileDigest.from_bytes(row["qd"]))
    return m_hll, m_cms, m_mg, m_qd


def value_hash(value) -> int:
    """Driver-side hash matching the JVM xxhash64(cast-to-string) used in
    the builders — so point queries hash identically."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    return spark.sql(f"SELECT xxhash64(CAST('{value}' AS STRING)) AS h").first()["h"]


def register_queries(register) -> None:
    from .queries import load as _load
    @register(
        "hll_registry_within_bound",
        "SELECT true AS hll_registry_ok",
        doc="our mergeable HLL registry (precision 12) estimates events.user_id "
            "cardinality within 3σ of exact (reference approximation.go:13-199)",
        tags=("sketch",),
    )
    def hll_registry_within_bound(spark, sf_dir):
        ev = _load(spark, sf_dir, "events")
        exact = ev.select("user_id").distinct().count()
        hll = build_hll(ev, "user_id")
        ok = abs(hll.estimate() - exact) / max(1, exact) < 3 * hll.error_bound
        return spark.createDataFrame([(bool(ok),)], "hll_registry_ok boolean")

    @register(
        "cms_freq_within_bound",
        "SELECT true AS cms_ok",
        doc="CountMinSketch (1000×5) point frequencies for every event_type are "
            "≥ exact and ≤ exact + ε·N (reference approximation.go:201-307)",
        tags=("sketch",),
    )
    def cms_freq_within_bound(spark, sf_dir):
        ev = _load(spark, sf_dir, "events")
        cms = build_cms(ev, "event_type")
        exact = {
            r["event_type"]: r["n"]
            for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
        }
        ok = all(
            exact[v] <= cms.query_hash(value_hash(v)) <= exact[v] + cms.epsilon * cms.total + 1
            for v in exact
        )
        return spark.createDataFrame([(bool(ok),)], "cms_ok boolean")

    @register(
        "mg_heavy_hitters_within_bound",
        "SELECT true AS mg_ok",
        doc="Misra-Gries heavy-hitters summary (k=8) over events."
            "user_id (cardinality >> k, so pruning really happens): "
            "every stored count underestimates the exact "
            "count by at most the tracked decrement D, absent values "
            "have exact count <= D, and every value with exact count "
            "> D is present — the full MG guarantee asserted against "
            "exact aggregation, not sampled",
        tags=("sketch",),
    )
    def mg_heavy_hitters_within_bound(spark, sf_dir):
        ev = _load(spark, sf_dir, "events")
        mg = build_mg(ev, "user_id", k=8)
        exact = {
            str(r["user_id"]): r["n"]
            for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
        }
        d = mg.decrements
        ok = (
            all(
                0 < mg.counters.get(v, 0) <= exact[v]
                and exact[v] - mg.counters.get(v, 0) <= d
                for v in mg.counters
            )
            and all(exact[v] <= d for v in exact if v not in mg.counters)
            and all(v in mg.counters for v in exact if exact[v] > d)
            and mg.total == sum(exact.values())
        )
        return spark.createDataFrame([(bool(ok),)], "mg_ok boolean")

    @register(
        "quantile_digest_within_bound",
        "SELECT true AS qd_ok",
        doc="mergeable quantile digest (uniform-cap t-digest, Dunning & "
            "Ertl) over events.value: for q in {0.1,0.25,0.5,0.75,0.9} "
            "the digest's PROVABLE guarantees are asserted against "
            "exact aggregation — the exact rank of the estimate lies "
            "inside the digest's own rank_bracket, q is inside the "
            "bracket widened by half the largest centroid, and the "
            "bracket is compact on this tie-free column",
        tags=("sketch",),
    )
    def quantile_digest_within_bound(spark, sf_dir):
        ev = _load(spark, sf_dir, "events")
        qd = build_qdigest(ev, "value", max_centroids=100)
        half_max = qd.rank_error_bound() / 2 + 1e-9
        n = ev.filter(F.col("value").isNotNull()).count()
        ok = True
        for q in (0.1, 0.25, 0.5, 0.75, 0.9):
            est = qd.quantile(q)
            lb, ub = qd.rank_bracket(est)
            slb, _ = qd.rank_bracket(est, strict=True)
            exact_le = ev.filter(F.col("value") <= F.lit(float(est))).count() / n
            ok = ok and (lb - 1e-12 <= exact_le <= ub + 1e-12)   # containment
            ok = ok and (slb - half_max <= q <= ub + 1e-12)      # walk consistency
            ok = ok and (ub - lb <= 0.1)                         # compactness
        return spark.createDataFrame([(bool(ok),)], "qd_ok boolean")


class ApproximateQueryEngine:
    """Per-(table, column) sketch registry with global merge — parity
    with the reference's registry (approximation.go:309-456)."""

    def __init__(self, precision: int = 12, cms_width: int = 1000,
                 cms_depth: int = 5, mg_k: int = 32):
        self.precision = precision
        self.cms_width = cms_width
        self.cms_depth = cms_depth
        self.mg_k = mg_k
        self._hll: dict[tuple[str, str], HyperLogLog] = {}
        self._cms: dict[tuple[str, str], CountMinSketch] = {}
        self._mg: dict[tuple[str, str], MisraGries] = {}
        self._qd: dict[tuple[str, str], QuantileDigest] = {}
        self._lock = threading.Lock()

    def update_from_dataframe(self, table: str, df: DataFrame,
                              columns: list[str],
                              replace: bool = False) -> None:
        """Build sketches for the columns in ONE scan each and fold them
        in. ``replace=False`` merges — the INCREMENTAL mode for sketching
        a batch of newly-ingested rows. ``replace=True`` overwrites — the
        REBUILD mode for sketching the full table again; merging a
        full-table rebuild into sketches derived from the same rows
        would double every count (and persist the doubled state)."""
        for col in columns:
            hll, cms, mg, qd = build_all_sketches(
                df, col, self.precision, self.cms_width, self.cms_depth,
                self.mg_k,
            )
            with self._lock:
                key = (table, col)
                if key in self._hll and not replace:
                    # guard each kind independently: state loaded from
                    # a pre-MG persisted store (or a column whose dtype
                    # changed) may hold hll/cms without mg/qd — merging
                    # only where present keeps the update atomic
                    self._hll[key].merge(hll)
                    self._cms[key].merge(cms)
                    if key in self._mg:
                        self._mg[key].merge(mg)
                    else:
                        self._mg[key] = mg
                    if qd is not None:
                        if key in self._qd:
                            self._qd[key].merge(qd)
                        else:
                            self._qd[key] = qd
                    elif key in self._qd:
                        # column no longer numeric: a digest from the
                        # old dtype era must not keep serving quantiles
                        del self._qd[key]
                else:
                    self._hll[key] = hll
                    self._cms[key] = cms
                    self._mg[key] = mg
                    if qd is not None:
                        self._qd[key] = qd
                    elif key in self._qd:
                        del self._qd[key]

    def cardinality(self, table: str, column: str) -> float:
        with self._lock:
            return self._hll[(table, column)].estimate()

    def frequency(self, table: str, column: str, value) -> int:
        with self._lock:
            return self._cms[(table, column)].query_hash(value_hash(value))

    def top_values(self, table: str, column: str, n: int = 10) -> list[tuple[str, int]]:
        """Heavy-hitter candidates from the MG summary, largest first —
        deterministic top-k candidates the CMS alone cannot enumerate;
        counts are MG lower bounds (underestimate ≤ tracked decrement)."""
        with self._lock:
            mg = self._mg[(table, column)]
            return sorted(mg.counters.items(), key=lambda kv: (-kv[1], kv[0]))[:n]

    def quantile(self, table: str, column: str, q: float) -> float:
        """Quantile estimate from the mergeable digest (numeric columns
        only). Point estimate is heuristic; for sound bounds use the
        digest's ``rank_bracket(est)`` — see QuantileDigest docs."""
        with self._lock:
            return self._qd[(table, column)].quantile(q)

    def merged_cardinality(self, pairs: list[tuple[str, str]]) -> float:
        """Cardinality of the union across (table, column) sketches —
        the registry's global-merge operation."""
        with self._lock:
            merged = HyperLogLog(self.precision)
            for key in pairs:
                merged.merge(self._hll[key])
            return merged.estimate()

    # -- persistence (reference keeps its registry server-side; ours
    #    rides the same shared-store KV the cache versions use, so the
    #    registry survives restarts and merges across drivers) ----------

    def save(self, kv) -> int:
        """Write every sketch to a KV (e.g. ``kv.FileKV`` on the store
        root). Key layout ``sketch/{hll|cms}/{table}/{column}``; sketch
        byte formats are the versioned to_bytes() encodings. Returns the
        number of objects written."""
        with self._lock:
            items = [("hll", k, s.to_bytes()) for k, s in self._hll.items()]
            items += [("cms", k, s.to_bytes()) for k, s in self._cms.items()]
            items += [("mg", k, s.to_bytes()) for k, s in self._mg.items()]
            items += [("qd", k, s.to_bytes()) for k, s in self._qd.items()]
        for kind, (table, col), data in items:
            kv.put(f"sketch/{kind}/{table}/{col}", data)
        return len(items)

    def load(self, kv, keys: list[tuple[str, str]],
             merge: bool = True, fill_missing: bool = False) -> int:
        """Load sketches for the given (table, column) keys from a KV.
        With ``merge=True`` (default) loaded sketches merge into any
        in-memory state — the cross-driver union; ``merge=False``
        replaces. ``fill_missing=True`` loads ONLY sketch kinds absent
        from memory — the accessor-fallback mode: merging a persisted
        copy into the live sketch it was saved from would double every
        count. Missing keys are skipped. Returns sketches loaded."""
        n = 0
        for table, col in keys:
            hb = kv.get(f"sketch/hll/{table}/{col}")
            cb = kv.get(f"sketch/cms/{table}/{col}")
            mb = kv.get(f"sketch/mg/{table}/{col}")
            qb = kv.get(f"sketch/qd/{table}/{col}")
            if hb is None and cb is None and mb is None and qb is None:
                continue
            with self._lock:
                key = (table, col)
                for raw, cls_, store in (
                    (hb, HyperLogLog, self._hll),
                    (cb, CountMinSketch, self._cms),
                    (mb, MisraGries, self._mg),
                    (qb, QuantileDigest, self._qd),
                ):
                    if raw is None:
                        continue
                    if fill_missing:
                        if key not in store:
                            store[key] = cls_.from_bytes(raw)
                        continue
                    loaded = cls_.from_bytes(raw)
                    if merge and key in store:
                        store[key].merge(loaded)
                    else:
                        store[key] = loaded
            n += 1
        return n
