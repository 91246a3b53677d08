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


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column) via per-batch HLL partials.

    Partial = (register, rho) rows (≤2^p per batch); final merge is a
    small ``groupby(register).max`` — constant-size regardless of input
    rows."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_hashes(_hash_values(batch.column(column).to_pylist()))
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

    class F:
        def __init__(self):
            self.bf = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = self.bf.contains(batch.column(column).to_pylist())
            if anti:
                mask = ~mask
            return batch.filter(pa.array(mask))

    return ds.map_batches(F, batch_format="pyarrow", concurrency=(1, 8),
                          num_cpus=1)
