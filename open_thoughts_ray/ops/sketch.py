"""Mergeable sketches: HyperLogLog distinct-count + Bloom membership.

The reference has no approximate aggregates (SURVEY.md §2.6); at 100 TB
they are how wide metrics stay cheap.  Both sketches here are
deterministic (stable crc/splitmix hashing — no PYTHONHASHSEED
dependence) and MERGEABLE: per-batch partials are tiny fixed-size
arrays combined associatively, so the Ray plan is
``map_batches(partial) → groupby(register).max`` with no row shuffle.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..common.hashing import splitmix64


class HyperLogLog:
    """Classic HLL with 2^p registers (p=12 → ~1.6 % relative error)."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = np.asarray(h, dtype=np.uint64)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rho = 1 + leading zeros of the remaining bits; count stops at
        # each element's FIRST 1-bit (active mask)
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        active = np.ones(len(h), dtype=bool)
        for _ in range(64 - self.p + 1):
            top = active & ((cur & mask) == 0)
            if not top.any():
                break
            lz[top] += 1
            active = top
            cur = cur << np.uint64(1)
        rho = lz + 1
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting for small n
        return float(est)


def _hash_values(values: list) -> np.ndarray:
    return splitmix64(
        np.asarray([zlib.crc32(str(v).encode()) for v in values], dtype=np.uint64)
    )


def _hash_values_md5(values: list) -> np.ndarray:
    """Big-endian first 8 bytes of md5(str(v)) — bit-reproducible in SQL
    as CAST('0x' || substr(md5(CAST(v AS VARCHAR)),1,16) AS UBIGINT), so
    an HLL built on it is oracle-checkable end to end."""
    import hashlib

    return np.asarray(
        [int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16) for v in values],
        dtype=np.uint64,
    )


def approx_distinct(ds, column: str, p: int = 12,
                    hasher: str = "crc") -> float:
    """Approximate COUNT(DISTINCT column) via per-batch HLL partials.

    Partial = (register, rho) rows (≤2^p per batch); final merge is a
    small ``groupby(register).max`` — constant-size regardless of input
    rows.  ``hasher``: "crc" (default, fastest) or "md5"
    (SQL-reproducible — see _hash_values_md5)."""
    from ray.data.aggregate import Max

    hash_fn = _hash_values_md5 if hasher == "md5" else _hash_values

    def partial(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_hashes(hash_fn(batch.column(column).to_pylist()))
        nz = np.nonzero(hll.registers)[0]
        return pa.table(
            {
                "reg": pa.array(nz.astype(np.int64), pa.int64()),
                "rho": pa.array(hll.registers[nz].astype(np.int64), pa.int64()),
            }
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("reg")
        .aggregate(Max("rho", alias_name="rho"))
        .to_pandas()
    )
    hll = HyperLogLog(p)
    hll.registers[merged["reg"].to_numpy()] = merged["rho"].to_numpy().astype(np.uint8)
    return hll.estimate()


class BloomFilter:
    """Deterministic Bloom filter (k hashes via splitmix64 re-mixing)."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 5):
        self.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8)
        self.n_bits = n_bits
        self.k = k

    def _positions(self, values: list) -> np.ndarray:
        h = _hash_values(values)
        pos = np.empty((len(values), self.k), dtype=np.int64)
        cur = h
        for j in range(self.k):
            cur = splitmix64(cur)
            pos[:, j] = (cur % np.uint64(self.n_bits)).astype(np.int64)
        return pos

    def add(self, values: list) -> None:
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def contains(self, values: list) -> np.ndarray:
        pos = self._positions(values)
        ok = np.ones(len(values), dtype=bool)
        for j in range(self.k):
            p = pos[:, j]
            ok &= (self.bits[p // 8] & (1 << (p % 8)).astype(np.uint8)) != 0
        return ok


def bloom_semi_join(ds, keys: list, column: str, anti: bool = False,
                    n_bits: int = 1 << 20):
    """Semi/anti join against a LARGE broadcast key set: ship a Bloom
    filter (n_bits/8 bytes) instead of the raw set.  False positives only
    (≈(1-e^{-kn/m})^k): exact for anti-join recall, approximate for semi
    precision — chase with an exact check on the survivors if needed."""
    import ray

    bf = BloomFilter(n_bits=n_bits)
    bf.add(list(keys))
    ref = ray.put(bf)

    # plain tasks + per-worker broadcast cache (ops/bcast.py)
    def f_task(batch: pa.Table, *, ref) -> pa.Table:
        from .bcast import cached_get

        bff = cached_get(ref)
        mask = bff.contains(batch.column(column).to_pylist())
        if anti:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return ds.map_batches(f_task, batch_format="pyarrow",
                          fn_kwargs={"ref": ref}, num_cpus=1)


# ----------------------------------------------------- quantile summary
class QuantileSummary:
    """Mergeable order-statistic summary: ``points`` = the block's sorted
    values sampled at ``num_points`` evenly spaced ranks, plus the block
    count.  Merging pools the points, evaluates the summed rank function
    at every pooled point, and resamples — the classic interpolated-
    histogram compaction (GK/t-digest-lite).  Rank error of a single
    summary ≤ n/num_points; merged error adds ≤ 1 rank per merged
    summary.  Deterministic (pure order statistics, no randomness)."""

    __slots__ = ("n", "points")

    def __init__(self, n: int, points: np.ndarray):
        self.n = int(n)
        self.points = np.asarray(points, dtype=np.float64)

    @classmethod
    def from_values(cls, values: np.ndarray, num_points: int = 1024) -> "QuantileSummary":
        v = np.sort(np.asarray(values, dtype=np.float64))
        n = len(v)
        if n == 0:
            return cls(0, np.empty(0))
        if n <= num_points:
            return cls(n, v)
        idx = np.round(np.linspace(0, n - 1, num_points)).astype(np.int64)
        return cls(n, v[idx])

    def _ranks(self) -> np.ndarray:
        """Global (0-based, fractional) order-statistic position of each
        stored point within its block."""
        m = len(self.points)
        if m == 0:
            return np.empty(0)
        if self.n == m:
            return np.arange(m, dtype=np.float64)
        return np.linspace(0.0, self.n - 1, m)

    def rank_of(self, v: np.ndarray) -> np.ndarray:
        """Estimated fractional position of value(s) v within this block
        (clipped to [0, n-1]); 0 below min is adjusted by -? — callers sum
        positions across blocks and invert."""
        if self.n == 0:
            return np.zeros(np.shape(v))
        return np.interp(v, self.points, self._ranks())

    @staticmethod
    def merge_all(summaries: list["QuantileSummary"],
                  num_points: int = 1024) -> "QuantileSummary":
        live = [s for s in summaries if s.n > 0]
        if not live:
            return QuantileSummary(0, np.empty(0))
        total = sum(s.n for s in live)
        pooled = np.unique(np.concatenate([s.points for s in live]))
        # summed rank function at every pooled point → resample at evenly
        # spaced target ranks
        summed = np.zeros(len(pooled))
        for s in live:
            summed += s.rank_of(pooled)
        target = np.linspace(summed[0], summed[-1], min(num_points, len(pooled)))
        points = np.interp(target, summed, pooled)
        return QuantileSummary(total, points)

    def quantile(self, q: float) -> float:
        """Linear-interpolation quantile (np.quantile 'linear' analogue);
        EXACT when the summary stores all n values."""
        if self.n == 0:
            return float("nan")
        h = q * (self.n - 1)
        return float(np.interp(h, self._ranks(), self.points))


def distributed_quantile(ds, column: str, q: float,
                         num_points: int = 1024,
                         merge_fanin: int = 64) -> float:
    """Approximate global quantile with bounded driver memory.

    map_batches partials (one summary row per ~64k values) → repartition
    to ``merge_fanin`` blocks → per-block merge → driver merges
    ≤ merge_fanin summaries.  Driver memory O(merge_fanin · num_points);
    rank error ≤ ~1/num_points + (#summaries)/N.
    """

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).to_numpy(zero_copy_only=False)
        s = QuantileSummary.from_values(vals, num_points)
        return pa.table({
            "n": pa.array([s.n], pa.int64()),
            "points": pa.array([s.points.tolist()], pa.list_(pa.float64())),
        })

    def merge_block(batch: pa.Table) -> pa.Table:
        ss = [QuantileSummary(n, np.asarray(p))
              for n, p in zip(batch.column("n").to_pylist(),
                              batch.column("points").to_pylist())]
        s = QuantileSummary.merge_all(ss, num_points)
        return pa.table({
            "n": pa.array([s.n], pa.int64()),
            "points": pa.array([s.points.tolist()], pa.list_(pa.float64())),
        })

    merged = (
        ds.select_columns([column])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .repartition(merge_fanin)
        .map_batches(merge_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()  # ≤ merge_fanin rows
    )
    final = QuantileSummary.merge_all(
        [QuantileSummary(r.n, np.asarray(r.points)) for r in merged.itertuples()],
        num_points,
    )
    return final.quantile(q)


# ------------------------------------------------------- approx top-k
def approx_top_k(ds, column: str, k: int = 10, partial_width: int = 256,
                 weight_col: str | None = None):
    """Approximate heavy hitters with a mergeable truncated-count sketch.

    Per batch the EXACT value counts are computed vectorized (np.unique —
    no per-row Python) and truncated to the ``partial_width`` most
    frequent; the dropped tail's maximum count is carried as that
    batch's error bound.  Partials merge with a plain groupby-sum (the
    same shape as the HLL registers above), so the shuffle carries at
    most partial_width rows per batch regardless of cardinality.

    Returns (list[(item, count_lower_bound)], max_underestimate):
    reported counts are lower bounds; any true count can be
    underestimated by at most Σ per-batch dropped-tail maxima, and every
    item whose true count exceeds that bound is guaranteed present
    (Space-Saving-style guarantee).  Exact when batches have ≤
    partial_width distinct values (then bound = 0).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).to_numpy(zero_copy_only=False)
        if weight_col is None:
            uniq, counts = np.unique(vals.astype(str), return_counts=True)
        else:
            # pre-weighted item stream (e.g. per-batch token counts):
            # sum weights per unique item, vectorized
            w = batch.column(weight_col).to_numpy(zero_copy_only=False)
            uniq, inverse = np.unique(vals.astype(str), return_inverse=True)
            counts = np.bincount(inverse, weights=w).astype(np.int64)
        if len(uniq) > partial_width:
            order = np.argsort(counts)[::-1]
            kept = order[:partial_width]
            bound = int(counts[order[partial_width]])
            uniq, counts = uniq[kept], counts[kept]
        else:
            bound = 0
        return pa.table({
            "item": pa.array(list(uniq), pa.string()),
            "c": pa.array(counts.astype(np.int64), pa.int64()),
            "bound": pa.array([bound] + [0] * (len(uniq) - 1) if len(uniq)
                              else [], pa.int64()),
        })

    cols = [column] if weight_col is None else [column, weight_col]
    agg = (
        ds.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("item")
        .aggregate(Sum("c", alias_name="n"), Sum("bound", alias_name="b"))
        .materialize()  # consumed twice below (top-k sort + bound sum)
    )
    top = agg.sort("n", descending=True).limit(k).to_pandas()
    total_bound = agg.map_batches(
        lambda t: pa.table({"b": pa.array(
            [int(np.sum(t.column("b").to_numpy(zero_copy_only=False)))],
            pa.int64())}),
        batch_format="pyarrow",
    ).sum("b")
    items = [(r.item, int(r.n)) for r in top.itertuples()]
    return items, int(total_bound or 0)
