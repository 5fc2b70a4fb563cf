"""Partitioned Bloom-filter URL-seen shards (BASELINE.json north_star).

The reference probes the visited ledger with one ``existsRow`` HTTP call
per candidate URL (``src/kvs/KVSClient.java:516-524``, used
``Crawler.java:376``) — a point-read storm (SURVEY.md §4.3). At 10^10 URLs
an exact anti-join of every wave's fresh links against the full ledger
shuffles the ledger repeatedly. Instead:

- the seen set is sharded by ``murmur3(host) % n_shards`` (Spark's
  ``F.hash`` *is* Murmur3-x86-32) so each executor-side probe touches one
  small bitset, and hot hosts spread probe load across batch rows only;
- each shard is a classic (m, k) Bloom bitset built with double hashing
  from the URL's 160-bit reference SHA-1 identity — **no false
  negatives**, so the filter is a pure pre-pass;
- probe-positive candidates (true dupes + ~1% false positives) go through
  the exact left-anti join; probe-negative candidates skip it entirely.

Shards are numpy bitsets broadcast to executors; per-wave additions are
OR-ed in driver-side (wave additions are ≤1 URL/host — tiny) and
re-broadcast. On a real cluster the same bitsets would be rebuilt
distributed via ``groupBy(shard).applyInPandas`` — ``build_distributed``
implements that path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

__all__ = ["BloomShards", "shard_of_host"]

_K = 7  # hash functions ⇒ ~1% fp at 10 bits/key


def shard_of_host(host_col, n_shards: int):
    """murmur3(host) mod n_shards as a Column (non-negative)."""
    return F.pmod(F.hash(host_col), F.lit(n_shards))


def _hash_pair(url_hash: str) -> tuple[int, int]:
    d = hashlib.blake2b(url_hash.encode(), digest_size=16).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big")


def _bit_positions(url_hash: str, m: int) -> list[int]:
    h1, h2 = _hash_pair(url_hash)
    return [(h1 + i * h2) % m for i in range(_K)]


class BloomShards:
    """A set of per-host-shard Bloom bitsets with a vectorized probe UDF."""

    def __init__(self, n_shards: int = 16, bits_per_shard: int = 1 << 17):
        self.n_shards = n_shards
        self.m = bits_per_shard
        self.bitmaps = np.zeros((n_shards, self.m // 8), dtype=np.uint8)
        self._bc = None

    # -- build / update ----------------------------------------------------
    def add(self, pairs: Iterable[tuple[str, int]]) -> None:
        """Add (url_hash, shard) pairs driver-side."""
        for url_hash, shard in pairs:
            bm = self.bitmaps[shard]
            for pos in _bit_positions(url_hash, self.m):
                bm[pos >> 3] |= 1 << (pos & 7)
        self._bc = None  # invalidate broadcast

    def build_from_seen(self, seen: DataFrame, host_col: str = "host") -> None:
        """Exact rebuild from a (url_hash, host) DataFrame — distributed
        bitset construction, driver only ORs n_shards small arrays."""
        shard = shard_of_host(F.col(host_col), self.n_shards)
        rows = seen.select(F.col("url_hash"), shard.alias("shard"))
        m, k, n_shards = self.m, _K, self.n_shards

        def per_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
            bm = np.zeros(m // 8, dtype=np.uint8)
            for uh in pdf["url_hash"]:
                d = hashlib.blake2b(uh.encode(), digest_size=16).digest()
                h1 = int.from_bytes(d[:8], "big")
                h2 = int.from_bytes(d[8:], "big")
                for i in range(k):
                    pos = (h1 + i * h2) % m
                    bm[pos >> 3] |= 1 << (pos & 7)
            return pd.DataFrame({"shard": [int(key[0])], "bitmap": [bm.tobytes()]})

        built = rows.groupBy("shard").applyInPandas(per_shard, "shard int, bitmap binary")
        self.bitmaps = np.zeros((n_shards, m // 8), dtype=np.uint8)
        for r in built.collect():
            self.bitmaps[r["shard"]] = np.frombuffer(r["bitmap"], dtype=np.uint8)
        self._bc = None

    # -- probe ---------------------------------------------------------------
    def probe_udf(self, spark: SparkSession):
        """pandas UDF (url_hash, shard) → maybe_seen. False ⇒ definitely new."""
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(self.bitmaps.copy())
        bc, m, k = self._bc, self.m, _K

        @pandas_udf(BooleanType())
        def probe(url_hash: pd.Series, shard: pd.Series) -> pd.Series:
            bitmaps = bc.value
            out = np.empty(len(url_hash), dtype=bool)
            for i, (uh, sh) in enumerate(zip(url_hash, shard)):
                bm = bitmaps[int(sh)]
                d = hashlib.blake2b(uh.encode(), digest_size=16).digest()
                h1 = int.from_bytes(d[:8], "big")
                h2 = int.from_bytes(d[8:], "big")
                hit = True
                for j in range(k):
                    pos = (h1 + j * h2) % m
                    if not (bm[pos >> 3] >> (pos & 7)) & 1:
                        hit = False
                        break
                out[i] = hit
            return pd.Series(out)

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
