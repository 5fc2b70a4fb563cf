"""Skew-mitigation operators: salted equi-join.

A shuffled equi-join puts every row of one key in ONE reducer task; at
100 TB a hot key (a mega-host, a null-ish default, a viral document)
turns the join into a single straggler. AQE's skew-join split handles
sort-merge cases adaptively, but only post-hoc per shuffle block and
not under every plan shape — ``salted_join`` is the explicit,
plannable fix: the big (skewed) side salts each row into one of
``n_salts`` sub-keys, the small side replicates every row across ALL
sub-keys, and the join key becomes (key, salt) — the hot key's rows
now spread over ``n_salts`` tasks. Result-set-invariant by
construction: each big-side row still meets every small-side row of
its key exactly once (in its salt slice).

Cost model: small side is materialized ``n_salts``× (explode before
the exchange) — use only when |small| × n_salts stays far below the
big side; for genuinely small dims prefer ``F.broadcast`` (no shuffle
at all). The salt is a deterministic hash of the whole big-side row,
so plans replay identically (no ``rand()`` — retries/speculative tasks
would otherwise see different salts mid-shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """→ ``big ⋈ small`` on ``on`` (equi), physically executed as an
    equi-join on ``on + [salt]`` so one hot key spans ``n_salts``
    reducer tasks instead of one.

    ``how`` supports the outer-ness of the BIG side only ('inner',
    'left'): a small-side-outer would need post-join reconciliation of
    the replicated unmatched rows. Column sets must be disjoint apart
    from ``on``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    keys = [on] if isinstance(on, str) else list(on)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.select(salt.cast("int").alias("_salt"), *big.columns)
    s = small.select(
        F.explode(
            F.array(*[F.lit(i) for i in range(n_salts)])
        ).alias("_salt"),
        *small.columns,
    )
    return b.join(s, on=["_salt", *keys], how=how).drop("_salt")
