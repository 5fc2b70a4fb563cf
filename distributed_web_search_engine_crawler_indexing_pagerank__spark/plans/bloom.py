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

Scale design:

- **vectorized double hashing**: the url_hash is ALREADY a 160-bit SHA-1
  (rendered in the reference alphabet), so probe positions need no second
  cryptographic hash — h1/h2 are 64-bit FNV-style polynomial hashes of
  its 40 codepoints, computed in numpy across the whole Arrow batch
  (~40 vector ops per batch, no per-row Python). ``m`` is a power of two
  and h2 is forced odd, so the k double-hash positions are distinct.
- **auto-sizing**: shards keep ≥ BITS_PER_KEY bits per inserted key
  (~0.8% fp at 10 bits, k=7). ``ensure_capacity`` grows ``m`` to the next
  power of two and rebuilds exactly from the seen ledger — a distributed
  ``groupBy(shard).applyInPandas``. Growth is geometric (2× headroom), so
  rebuild cost amortizes like a dynamic array.
- **two storage/probe shapes** (round 3): :class:`BloomShards` is the
  driver-resident form (bitmaps in one numpy matrix, broadcast probe) —
  fine for tools and tests; :class:`BloomStore` is the CRAWL path's
  catalog-backed form — bitmaps as a table, probes either map-side
  against a snapshot-cached broadcast (small regime) or shard-routed by
  cogroup with O(one shard) per task (scale regime), updates folded
  executor-side. Nothing is collected to the driver per wave.

Consistency invariant: add/build/fold/probe all derive positions from the
same ``_hash_pair`` basis, and any resume either reuses the durable shard
table or rebuilds it exactly from the seen ledger — so a bit set by one
path is always found by another (the no-false-negative guarantee the
exact anti-join relies on).
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

__all__ = ["BloomShards", "BloomStore", "shard_of_host"]

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

        def per_shard(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
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


_BLOOM_ROW_SCHEMA = "shard int, m long, bitmap binary, n_keys long, _v long"

# Rewrite the shard table in full after this many incremental (dirty-
# shard delta) fold commits — bounds merge-on-read resolution at
# ~(1 + COMPACT_EVERY) rows per shard while keeping per-commit write
# volume O(dirty shards). Mirrors the hosts-delta pattern
# (crawl.py HOSTS_COMPACT_EVERY).
BLOOM_COMPACT_EVERY = 8


class BloomStore:
    """Catalog-backed sharded Bloom bitsets — probe AND update run
    EXECUTOR-side; the driver never holds, broadcasts, or collects a
    bitmap.

    This is the 10^10-URL shape of the URL-seen filter (the reference's
    distributed ``existsRow`` probe, ``src/kvs/KVSClient.java:516-524``,
    where each KVS worker answers only for its own key range):

    - **storage**: one catalog table (default ``bloom``), one row per
      shard ``(shard, m, bitmap, n_keys)``, committed alongside each
      durable crawl snapshot. At the north star (~12 GB of bitmaps over
      thousands of shards) this is an ordinary partitioned table — no
      12 GB broadcast to every executor, no driver-resident copy.
    - **probe**: candidates are repartitioned by ``shard_of_host`` and
      COGROUPED with the bitmap rows (``applyInPandas``): each task
      deserializes exactly ONE shard's bitset, so probe memory is
      O(m/8) per task regardless of n_shards. Asserted in tests.
    - **pending additions**: seen-rows staged since the last durable
      snapshot ride into the probe as extra ``(shard, url_hash)`` rows
      unioned onto the bitmap side; the task ORs them into its local
      copy before probing — zero false negatives across a fast-path
      checkpoint interval, still with no driver round-trip.
    - **update**: at each durable commit the interval's additions are
      folded into their shards by the same cogroup shape and ONLY the
      dirty shards' new rows are APPENDED, stamped with a monotonic
      version ``_v``; reads resolve latest-wins per shard. Every
      ``BLOOM_COMPACT_EVERY`` delta commits the resolved table is
      rewritten in full (compaction), bounding the merge-on-read row
      count — the same base + deltas + compaction shape as the hosts
      table, and the reference's one-row-per-touched-key write profile
      (``src/kvs/KVSClient.java:259-282``).

    ``n_keys``/``m`` mirror :class:`BloomShards` so capacity planning
    (``ensure_capacity`` — ≥ BITS_PER_KEY bits/key, power-of-two m,
    2× headroom, exact rebuild from the seen ledger) works identically.
    ``n_keys`` counts the FOLDED (durable) population and is recomputed
    from the committed shard rows at every fold/rebuild (never
    accumulated across calls — the r3 overcount); ``n_pending`` counts
    staged-interval additions not yet folded, maintained by the caller,
    and both feed ``ensure_capacity``.
    """

    def __init__(
        self,
        catalog,
        n_shards: int = 16,
        bits_per_shard: int = 1 << 17,
        table: str = "bloom",
        broadcast_threshold: int = 64 << 20,
        compact_every: int = BLOOM_COMPACT_EVERY,
    ):
        assert bits_per_shard & (bits_per_shard - 1) == 0, "m must be a power of 2"
        self.cat = catalog
        self.n_shards = n_shards
        self.m = bits_per_shard
        self.table = table
        # Probe strategy follows the join-strategy rule: while the whole
        # bitmap set fits comfortably in one executor (≤ threshold,
        # mirroring autoBroadcastJoinThreshold), probe map-side against a
        # broadcast of the table (no candidate shuffle — the filter is
        # small, so shipping it to the data wins); past the threshold,
        # shard-route (cogroup) so per-task memory stays O(one shard's
        # delta chain).
        # The broadcast is rebuilt only when the table snapshot changes
        # (once per durable interval), never per wave.
        self.broadcast_threshold = broadcast_threshold
        self.compact_every = compact_every
        self.n_keys = 0
        self.n_pending = 0
        self._bc: tuple[int | None, int, object] | None = None
        self._ver = 0
        self._commits_since_compact = 0
        self._ver_synced = False

    # -- table io ----------------------------------------------------------
    def _raw_df(self, spark: SparkSession) -> DataFrame:
        """All committed shard rows, base + deltas (may hold several
        versions per shard between compactions)."""
        if self.cat.exists(self.table):
            return self.cat.read(spark, self.table)
        return spark.createDataFrame([], _BLOOM_ROW_SCHEMA)

    def bitmaps_df(self, spark: SparkSession) -> DataFrame:
        """Latest-wins resolved view: exactly one row per shard."""
        w = Window.partitionBy("shard").orderBy(F.desc("_v"))
        return (
            self._raw_df(spark)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def _sync_ver(self) -> None:
        """Restore the monotonic version + compaction counters from the
        current table snapshot (resume path)."""
        if self._ver_synced:
            return
        self._ver_synced = True
        snap = (
            self.cat.current_snapshot(self.table) if self.cat.exists(self.table) else None
        )
        if snap is not None:
            self._ver = int(snap.properties.get("ver", 0))
            self._commits_since_compact = int(
                snap.properties.get("delta_commits", 0)
            )

    def _recount_keys(self, spark: SparkSession) -> None:
        """``n_keys`` from the committed shard rows (latest-wins sum) —
        a column-pruned read of a tiny table, never an accumulation
        (the r3 ADVICE overcount: accumulating per-call row counts
        double-counted a staged interval after a mid-interval rebuild)."""
        total = (
            self.bitmaps_df(spark).agg(F.sum("n_keys").alias("t")).first()["t"]
        )
        self.n_keys = int(total or 0)
        self.cat.update_properties(self.table, {"m": self.m, "n_keys": self.n_keys})

    # -- build / update ----------------------------------------------------
    def build_from_seen(
        self, seen: DataFrame, host_col: str = "host", properties: dict | None = None
    ) -> None:
        """Exact distributed rebuild from a (url_hash, host) DataFrame:
        groupBy(shard).applyInPandas builds each bitset where its rows
        live and the result is committed as a table — the driver moves
        only the commit metadata."""
        spark = seen.sparkSession
        self._sync_ver()
        shard = shard_of_host(F.col(host_col), self.n_shards)
        rows = seen.select(F.col("url_hash"), shard.alias("shard"))
        m = self.m
        self._ver += 1
        ver = self._ver

        def per_shard(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            bm = np.zeros(m // 8, dtype=np.uint8)
            _set_bits(bm, pdf["url_hash"].to_numpy())
            return pd.DataFrame(
                {
                    "shard": [int(key[0])],
                    "m": [m],
                    "bitmap": [bm.tobytes()],
                    "n_keys": [len(pdf)],
                    "_v": [ver],
                }
            )

        built = rows.groupBy("shard").applyInPandas(per_shard, _BLOOM_ROW_SCHEMA)
        # count via the tiny (n_shards-row) result, not the big input
        self.cat.write(
            self.table,
            built,
            properties={
                "ver": ver,
                "delta_commits": 0,
                "compacted": True,
                **dict(properties or {}),
            },
        )
        self._commits_since_compact = 0
        self._recount_keys(spark)

    def fold_additions(
        self,
        additions: DataFrame,
        host_col: str = "host",
        properties: dict | None = None,
        dirty_shards: list[int] | None = None,
    ) -> None:
        """Fold (url_hash, host) additions into their shards executor-side
        (cogroup: each task gets one shard's latest bitmap + its
        additions) and APPEND only the dirty shards' new rows (version
        ``_v``+1) — commit write volume is O(dirty shards), not O(all
        shards). Every ``compact_every`` delta commits the fold emits
        every shard and overwrites (compaction). ``dirty_shards``, when
        the caller tracked it (the crawl's per-shard Observation
        counters), prunes the bitmap-side scan to the touched shards via
        a pushed-down IN filter — zero extra jobs. The fold validates the
        list executor-side: a shard that has additions but is missing
        from ``dirty_shards`` raises (the bitmap side was pruned away —
        zero-basing it would silently lose every previously folded key).

        Contract: additions must be keys NOT already in the folded
        ledger (the crawl's seen-additions are exact-deduped upstream);
        per-shard ``n_keys`` adds ``len(additions)`` under that contract
        and ``self.n_keys`` is recomputed from the committed rows."""
        spark = additions.sparkSession
        self._sync_ver()
        shard = shard_of_host(F.col(host_col), self.n_shards)
        adds = additions.select(F.col("url_hash"), shard.alias("shard"))
        compacting = self._commits_since_compact >= self.compact_every
        right = self._raw_df(spark)
        pruned_to: frozenset[int] | None = None
        if dirty_shards is not None and not compacting:
            # pushed-down row-group pruning on the tiny shard table
            pruned_to = frozenset(int(s) for s in dirty_shards)
            right = right.where(F.col("shard").isin(list(pruned_to)))
        m_default = self.m
        self._ver += 1
        ver = self._ver
        emit_all = compacting

        def fold(
            key: tuple, adds_pdf: pd.DataFrame, bm_pdf: pd.DataFrame
        ) -> pd.DataFrame:
            if len(adds_pdf) and pruned_to is not None and int(key[0]) not in pruned_to:
                # a wrong dirty_shards list filtered this shard's bitmap out
                # of the cogroup: folding would zero-base it and a higher-_v
                # row would silently supersede the real bitmap (losing every
                # previously folded key). Fail loudly instead — the caller's
                # dirty tracking, not the data, is wrong.
                raise AssertionError(
                    f"shard {int(key[0])} has {len(adds_pdf)} additions but is "
                    "not in dirty_shards — refusing to zero-base a pruned "
                    "bitmap; pass the shard in dirty_shards (or None)"
                )
            if not len(adds_pdf) and not emit_all:
                # clean shard on a delta commit: no row — the previous
                # version stays current under latest-wins
                return pd.DataFrame(
                    {"shard": [], "m": [], "bitmap": [], "n_keys": [], "_v": []}
                )
            if len(bm_pdf):
                # latest-wins within the task: one row per committed
                # version; duplicates mean the delta chain double-read
                if bm_pdf["_v"].nunique() != len(bm_pdf):
                    raise AssertionError(
                        f"shard {int(key[0])}: duplicate bitmap versions in one "
                        "fold task — delta chain corrupt"
                    )
                top = bm_pdf.loc[bm_pdf["_v"].idxmax()]
                bm = np.frombuffer(top["bitmap"], dtype=np.uint8).copy()
                base = int(top["n_keys"])
            else:
                bm = np.zeros(m_default // 8, dtype=np.uint8)
                base = 0
            if len(adds_pdf):
                _set_bits(bm, adds_pdf["url_hash"].to_numpy())
            return pd.DataFrame(
                {
                    "shard": [int(key[0])],
                    "m": [len(bm) * 8],
                    "bitmap": [bm.tobytes()],
                    "n_keys": [base + len(adds_pdf)],
                    "_v": [ver],
                }
            )

        out = (
            adds.groupBy("shard")
            .cogroup(right.groupBy("shard"))
            .applyInPandas(fold, _BLOOM_ROW_SCHEMA)
        )
        props = {"ver": ver, **dict(properties or {})}
        if compacting:
            self.cat.write(
                self.table,
                out,
                properties={**props, "delta_commits": 0, "compacted": True},
            )
            self._commits_since_compact = 0
        else:
            self._commits_since_compact += 1
            self.cat.write(
                self.table,
                out,
                mode="append",
                properties={**props, "delta_commits": self._commits_since_compact},
            )
        self._recount_keys(spark)
        self.n_pending = 0

    def ensure_capacity(
        self, seen: DataFrame, expected_new: int = 0, host_col: str = "host"
    ) -> bool:
        """Grow shards (power-of-two m, 2× headroom) and rebuild from the
        ledger when bits/key would drop below BITS_PER_KEY. Sizing counts
        the folded population (``n_keys``, recomputed from the committed
        rows) plus staged-interval additions (``n_pending``, bumped by
        the caller's per-wave Observation counters). ``seen`` should be
        the COMMITTED ledger — staged additions keep riding into probes
        as pending rows, so a committed-only rebuild stays exact."""
        needed_bits = BITS_PER_KEY * (self.n_keys + self.n_pending + expected_new)
        if self.m * self.n_shards >= needed_bits:
            return False
        new_m = self.m
        while new_m * self.n_shards < 2 * needed_bits:
            new_m *= 2
        self.m = new_m
        self.build_from_seen(seen, host_col=host_col, properties={"grown": True})
        return True

    # -- probe -------------------------------------------------------------
    def probe_flagged(
        self,
        candidates: DataFrame,
        pending: DataFrame | None = None,
        host_col: str = "host",
    ) -> DataFrame:
        """→ candidates + ``_maybe`` boolean (False ⇒ definitely new).
        Candidates are shuffled by shard; each task sees one shard's
        bitmap delta chain (≤ 1 + compact_every rows, resolved
        latest-wins in-task — no extra shuffle) plus that shard's
        pending additions and its candidate rows — never another
        shard's bytes."""
        spark = candidates.sparkSession
        cand = candidates.withColumn(
            "_shard", shard_of_host(F.col(host_col), self.n_shards)
        )
        right = self._raw_df(spark).select(
            "shard", "m", "bitmap", "_v", F.lit(None).cast("string").alias("url_hash")
        )
        if pending is not None:
            pend = pending.select(
                shard_of_host(F.col(host_col), self.n_shards).alias("shard"),
                F.lit(None).cast("long").alias("m"),
                F.lit(None).cast("binary").alias("bitmap"),
                F.lit(None).cast("long").alias("_v"),
                "url_hash",
            )
            right = right.unionByName(pend)
        m_default = self.m
        max_chain = 1 + self.compact_every
        out_fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
        )
        out_schema = f"{out_fields}, _maybe boolean"
        cand_cols = [f.name for f in candidates.schema.fields]

        def probe(
            key: tuple, cand_pdf: pd.DataFrame, right_pdf: pd.DataFrame
        ) -> pd.DataFrame:
            res = cand_pdf[cand_cols].copy()
            if not len(cand_pdf):
                res["_maybe"] = np.empty(0, dtype=bool)
                return res
            bm_rows = right_pdf[right_pdf["bitmap"].notna()] if len(right_pdf) else right_pdf
            # the O(one-shard) guarantee: a probe task holds one shard's
            # bounded delta chain, one committed row per version —
            # duplicate versions or an over-length chain mean the shard
            # routing / compaction schedule broke
            if len(bm_rows) > max_chain or (
                len(bm_rows) and bm_rows["_v"].nunique() != len(bm_rows)
            ):
                raise AssertionError(
                    f"shard {int(key[0])}: {len(bm_rows)} bitmap rows in one "
                    f"probe task (bound {max_chain}, versions must be unique) "
                    "— delta chain corrupt"
                )
            if len(bm_rows):
                top = bm_rows.loc[bm_rows["_v"].idxmax()]
                bm = np.frombuffer(top["bitmap"], dtype=np.uint8)
                m = int(top["m"])
            else:
                bm, m = None, m_default
            pend = (
                right_pdf[right_pdf["bitmap"].isna()]["url_hash"]
                if len(right_pdf)
                else []
            )
            if len(pend):
                bm = np.zeros(m // 8, dtype=np.uint8) if bm is None else bm.copy()
                _set_bits(bm, np.asarray(pend, dtype="U40"))
            if bm is None:
                res["_maybe"] = np.zeros(len(cand_pdf), dtype=bool)
                return res
            h1, h2 = _hash_pair(cand_pdf["url_hash"].to_numpy())
            byte_idx, bit = _positions(h1, h2, m)
            vals = bm[byte_idx]
            res["_maybe"] = ((vals >> bit) & 1).all(axis=1)
            return res

        return (
            cand.groupBy("_shard")
            .cogroup(right.groupBy("shard"))
            .applyInPandas(probe, out_schema)
        )

    def _bitmaps_broadcast(self, spark: SparkSession):
        """Broadcast of the full (small-regime) bitmap matrix, cached by
        table snapshot id — collected once per durable interval."""
        snap = self.cat.current_snapshot(self.table) if self.cat.exists(self.table) else None
        sid = snap.snapshot_id if snap is not None else None
        if self._bc is not None and self._bc[0] == sid and self._bc[1] == self.m:
            return self._bc[2]
        arr = np.zeros((self.n_shards, self.m // 8), dtype=np.uint8)
        if sid is not None:
            best: dict[int, int] = {}
            for r in self.cat.read(spark, self.table).collect():
                if best.get(r["shard"], -1) >= r["_v"]:
                    continue  # latest-wins across the delta chain
                best[r["shard"]] = r["_v"]
                bm = np.frombuffer(r["bitmap"], dtype=np.uint8)
                assert len(bm) * 8 == self.m, "bitmap row at stale m — rebuild required"
                arr[r["shard"]] = bm
        if self._bc is not None:
            # the JVM ContextCleaner reclaims dropped broadcasts only at
            # GC pressure — destroy the superseded one explicitly or a
            # long crawl accumulates up to 64 MB per durable interval
            try:
                self._bc[2].destroy()
            except Exception:
                pass  # already destroyed / context gone — nothing to free
        bc = spark.sparkContext.broadcast(arr)
        self._bc = (sid, self.m, bc)
        return bc

    def _probe_broadcast_udf(self, spark: SparkSession):
        bc, m = self._bitmaps_broadcast(spark), self.m

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

    def filter_unseen(
        self,
        spark: SparkSession,
        candidates: DataFrame,
        seen: DataFrame,
        pending: DataFrame | None = None,
    ) -> DataFrame:
        """Candidates not in ``seen``: Bloom pre-pass + exact left-anti
        join on the maybe-hits only. Zero false negatives by construction
        (bitmaps cover the durable ledger; staged-interval additions are
        covered by pending rows in the shard-routed path, by an exact
        broadcast anti-join in the small-regime path). Eagerly
        materialized: the clean/maybe split scans the flagged frame
        twice, and a lazy cache would let the scans race."""
        if self.n_shards * (self.m // 8) <= self.broadcast_threshold:
            # small regime: map-side probe against the broadcast matrix
            # (no candidate shuffle); pending additions are exact-filtered
            # by a broadcast anti-join — pending is interval-bounded and,
            # in this regime, tiny relative to the cluster.
            if pending is not None:
                candidates = candidates.join(
                    F.broadcast(pending.select("url_hash")), "url_hash", "left_anti"
                )
            probe = self._probe_broadcast_udf(spark)
            shard = shard_of_host(F.col("host"), self.n_shards)
            flagged = candidates.withColumn(
                "_maybe", probe(F.col("url_hash"), shard)
            ).localCheckpoint(eager=True)
        else:
            flagged = self.probe_flagged(candidates, pending=pending).localCheckpoint(
                eager=True
            )
        clean = flagged.where(~F.col("_maybe")).drop("_maybe")
        maybe = flagged.where(F.col("_maybe")).drop("_maybe")
        verified = maybe.join(seen.select("url_hash"), "url_hash", "left_anti")
        return clean.unionByName(verified)
