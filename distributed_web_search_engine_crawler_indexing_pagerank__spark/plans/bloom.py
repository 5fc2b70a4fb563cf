"""Partitioned Bloom-filter URL-seen shards (BASELINE.json north_star).

The reference probes the visited ledger with one ``existsRow`` HTTP call
per candidate URL (``src/kvs/KVSClient.java:516-524``, used
``Crawler.java:376``) — a point-read storm (SURVEY.md §4.3). At 10^10 URLs
an exact anti-join of every wave's fresh links against the full ledger
shuffles the ledger repeatedly. Instead:

- the seen set is sharded by ``murmur3(host) % n_shards`` (Spark's
  ``F.hash`` *is* Murmur3-x86-32) so each executor-side probe touches one
  small bitset, and hot hosts spread probe load across batch rows only;
- each shard is a classic (m, k) Bloom bitset — **no false negatives**,
  so the filter is a pure pre-pass;
- probe-positive candidates (true dupes + ~1% false positives) go through
  the exact left-anti join; probe-negative candidates skip it entirely.

Round-2 scale design:

- **vectorized double hashing**: the url_hash is ALREADY a 160-bit SHA-1
  (rendered in the reference alphabet), so probe positions need no second
  cryptographic hash — h1/h2 are 64-bit FNV-style polynomial hashes of
  its 40 codepoints, computed in numpy across the whole Arrow batch
  (~40 vector ops per batch, no per-row Python). ``m`` is a power of two
  and h2 is forced odd, so the k double-hash positions are distinct.
- **auto-sizing**: shards keep ≥ BITS_PER_KEY bits per inserted key
  (~0.8% fp at 10 bits, k=7). ``ensure_capacity`` grows ``m`` to the next
  power of two and rebuilds exactly from the seen ledger — a distributed
  ``groupBy(shard).applyInPandas`` whose driver cost is collecting
  n_shards bitmaps, never rows. Growth is geometric (2× headroom), so
  rebuild cost amortizes like a dynamic array.
- **vectorized maintenance**: per-wave additions OR bits via
  ``np.bitwise_or.at`` (no Python loop); shards re-broadcast lazily on
  next probe.

Consistency invariant: add/build/probe all derive positions from the same
``_hash_pair`` basis, and any cross-process resume rebuilds every bitmap
via ``build_from_seen`` — so a bit set by one path is always found by
another (the no-false-negative guarantee the exact anti-join relies on).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

__all__ = ["BloomShards", "shard_of_host"]

_K = 7  # hash functions ⇒ ~0.8% fp at 10 bits/key
BITS_PER_KEY = 10

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_H2_OFFSET = np.uint64(0x9E3779B97F4A7C15)
_H2_PRIME = np.uint64(0xFF51AFD7ED558CCD)


def shard_of_host(host_col, n_shards: int):
    """murmur3(host) mod n_shards as a Column (non-negative)."""
    return F.pmod(F.hash(host_col), F.lit(n_shards))


def _hash_pair(url_hashes) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (h1, h2) over an array-like of 40-char url_hash strings.
    h2 is forced odd so (h1 + i*h2) mod 2^b walks distinct positions."""
    arr = np.asarray(url_hashes, dtype="U40")
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    codes = np.frombuffer(arr.tobytes(), dtype=np.uint32).reshape(n, 40)
    h1 = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    h2 = np.full(n, _H2_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(40):
            c = codes[:, j].astype(np.uint64)
            h1 = (h1 ^ c) * _FNV_PRIME
            h2 = (h2 + (c + np.uint64(j + 1))) * _H2_PRIME
    return h1, h2 | np.uint64(1)


def _positions(h1: np.ndarray, h2: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """→ (byte_idx, bit) arrays of shape (n, _K). m must be a power of 2."""
    mask = np.uint64(m - 1)
    ii = np.arange(_K, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + ii * h2[:, None]) & mask
    return (pos >> np.uint64(3)).astype(np.int64), (pos & np.uint64(7)).astype(np.uint8)


def _set_bits(bm: np.ndarray, url_hashes) -> None:
    h1, h2 = _hash_pair(url_hashes)
    byte_idx, bit = _positions(h1, h2, len(bm) * 8)
    np.bitwise_or.at(
        bm, byte_idx.ravel(), (np.uint8(1) << bit.ravel()).astype(np.uint8)
    )


class BloomShards:
    """Per-host-shard Bloom bitsets with a vectorized probe UDF."""

    def __init__(self, n_shards: int = 16, bits_per_shard: int = 1 << 17):
        assert bits_per_shard & (bits_per_shard - 1) == 0, "m must be a power of 2"
        self.n_shards = n_shards
        self.m = bits_per_shard
        self.bitmaps = np.zeros((n_shards, self.m // 8), dtype=np.uint8)
        self.n_keys = 0
        self._bc = None

    # -- build / update ----------------------------------------------------
    def add(self, pairs: Iterable[tuple[str, int]]) -> None:
        """Add (url_hash, shard) pairs driver-side (vectorized)."""
        pairs = list(pairs)
        if not pairs:
            return
        hashes = np.asarray([p[0] for p in pairs], dtype="U40")
        shards = np.asarray([p[1] for p in pairs], dtype=np.int64)
        self.add_arrays(hashes, shards)

    def add_arrays(self, url_hashes: np.ndarray, shards: np.ndarray) -> None:
        """Vectorized driver-side add of url_hash/shard arrays."""
        n = len(url_hashes)
        if n == 0:
            return
        order = np.argsort(shards, kind="stable")
        sh_sorted = shards[order]
        uh_sorted = np.asarray(url_hashes, dtype="U40")[order]
        bounds = np.searchsorted(sh_sorted, np.arange(self.n_shards + 1))
        for s in range(self.n_shards):
            lo, hi = bounds[s], bounds[s + 1]
            if hi > lo:
                _set_bits(self.bitmaps[s], uh_sorted[lo:hi])
        self.n_keys += n
        self._bc = None  # invalidate broadcast

    def build_from_seen(self, seen: DataFrame, host_col: str = "host") -> None:
        """Exact rebuild from a (url_hash, host) DataFrame — distributed
        bitset construction; the driver only ORs n_shards small arrays."""
        shard = shard_of_host(F.col(host_col), self.n_shards)
        rows = seen.select(F.col("url_hash"), shard.alias("shard"))
        m, n_shards = self.m, self.n_shards

        def per_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            bm = np.zeros(m // 8, dtype=np.uint8)
            _set_bits(bm, pdf["url_hash"].to_numpy())
            return pd.DataFrame(
                {"shard": [int(key[0])], "bitmap": [bm.tobytes()], "n": [len(pdf)]}
            )

        built = rows.groupBy("shard").applyInPandas(
            per_shard, "shard int, bitmap binary, n long"
        )
        self.bitmaps = np.zeros((n_shards, m // 8), dtype=np.uint8)
        total = 0
        for r in built.collect():
            self.bitmaps[r["shard"]] = np.frombuffer(r["bitmap"], dtype=np.uint8)
            total += int(r["n"])
        self.n_keys = total
        self._bc = None

    def ensure_capacity(self, seen: DataFrame, expected_new: int = 0) -> bool:
        """Grow shards (power-of-two m, 2× headroom) and rebuild from the
        ledger when bits/key would drop below BITS_PER_KEY. Returns True
        if a rebuild happened. ``seen`` must carry (url_hash, host)."""
        needed_bits = BITS_PER_KEY * (self.n_keys + expected_new)
        if self.m * self.n_shards >= needed_bits:
            return False
        new_m = self.m
        while new_m * self.n_shards < 2 * needed_bits:
            new_m *= 2
        self.m = new_m
        self.build_from_seen(seen)
        return True

    # -- probe ---------------------------------------------------------------
    def probe_udf(self, spark: SparkSession):
        """pandas UDF (url_hash, shard) → maybe_seen. False ⇒ definitely new."""
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(self.bitmaps.copy())
        bc, m = self._bc, self.m

        @pandas_udf(BooleanType())
        def probe(url_hash: pd.Series, shard: pd.Series) -> pd.Series:
            bitmaps = bc.value
            n = len(url_hash)
            if n == 0:
                return pd.Series(np.empty(0, dtype=bool))
            h1, h2 = _hash_pair(url_hash.to_numpy())
            byte_idx, bit = _positions(h1, h2, m)
            sh = shard.to_numpy().astype(np.int64)[:, None]
            vals = bitmaps[sh, byte_idx]
            return pd.Series(((vals >> bit) & 1).all(axis=1))

        return probe

    def filter_unseen(self, spark: SparkSession, candidates: DataFrame, seen: DataFrame) -> DataFrame:
        """Candidates not in ``seen``: Bloom pre-pass + exact anti-join on
        the maybe-hits only. Zero false negatives by construction.

        The flagged frame is EAGERLY materialized (localCheckpoint): the
        clean/maybe split consumes it from two scans in one job, and a
        lazily-persisted cache lets those scans race and compute cold
        partitions twice — doubling the entire upstream (link-extraction
        UDFs included). One explicit materialization job is far cheaper.
        """
        probe = self.probe_udf(spark)
        shard = shard_of_host(F.col("host"), self.n_shards)
        flagged = candidates.withColumn(
            "_maybe", probe(F.col("url_hash"), shard)
        ).localCheckpoint(eager=True)
        clean = flagged.where(~F.col("_maybe")).drop("_maybe")
        maybe = flagged.where(F.col("_maybe")).drop("_maybe")
        verified = maybe.join(seen.select("url_hash"), "url_hash", "left_anti")
        return clean.unionByName(verified)
