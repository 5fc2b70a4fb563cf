"""HITS hubs & authorities (Kleinberg 1999) over the crawl link graph.

Complements PageRank (plans/pagerank.py): PageRank measures global
random-surfer authority; HITS separates "pages that point at good
pages" (hubs — link directories, index pages) from "pages good pages
point at" (authorities), which a search frontend can blend per query
and a crawler can use to prioritize hub-heavy hosts for frontier
expansion.

Determinism choice: the textbook normalizes by the L2 norm each
iteration, but power iteration converges to the same principal
eigenvector direction under ANY norm — and a sum-of-squares is
summation-order-dependent in floating point, which would make the
DuckDB oracle flap. We normalize by the per-iteration MAX instead
(exact, order-independent), so scores land in [0, 1] with the top
hub/authority at exactly 1.0 and every arithmetic step reproduces
bit-for-bit across engines and runs.

Scale shape: same as a PageRank pass — each half-iteration is one
edge⨝score join and one hash aggregation on the gather key; per-round
``localCheckpoint`` keeps the plan depth O(1); the max is a scalar agg
folded back as a literal, not a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["hits", "HITS_MAX_ITERATIONS"]

HITS_MAX_ITERATIONS = 20


def hits(
    graph: DataFrame,
    max_iter: int = HITS_MAX_ITERATIONS,
    eps: float = 0.001,
    stats: dict | None = None,
) -> DataFrame:
    """→ (url, hub, authority), max-normalized to [0, 1].

    ``graph`` is the P1 frame (src, dests array<string>) —
    :func:`..plans.pagerank.build_graph` output. Vertices are the graph
    sources; edges to unknown dests are dropped (both endpoints must be
    crawled pages, matching the reference's gather-side drop). Stops at
    L∞ residual < ``eps`` over both score vectors or ``max_iter``; pass
    ``eps=0.0`` for a fixed-iteration run (the oracle-checked mode).
    """
    vertices = (
        graph.select(F.col("src").alias("url"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("hub", F.lit(0.0)).withColumn(
            "authority", F.lit(0.0)
        )
    edges = (
        graph.select("src", F.explode("dests").alias("dst"))
        .distinct()
        .join(vertices.withColumnRenamed("url", "dst"), "dst", "left_semi")
        .localCheckpoint(eager=True)
    )
    hub = vertices.withColumn("s", F.lit(1.0))
    auth = vertices.withColumn("s", F.lit(1.0))

    from pyspark.sql import Observation

    def _gather(scores: DataFrame, key_from: str, key_to: str, tag: str) -> DataFrame:
        """One half-step: sum the counterpart score over edges into
        key_to, then max-normalize. Vertices with no gathered mass
        score 0.

        ONE action (r6, was 3): the global max rides as an Observation
        metric on the job that checkpoints the raw gather, and the
        normalized frame is a LAZY projection over that checkpointed
        raw (divide-by-literal + the vertices left join) — same doubles,
        no second materialization pass and no separate max job."""
        obs = Observation(tag)
        raw = (
            edges.join(
                scores.withColumnRenamed("url", key_from), key_from
            )
            .groupBy(F.col(key_to).alias("url"))
            .agg(F.sum("s").alias("g"))
            .observe(obs, F.max("g").alias("mx"))
            .localCheckpoint(eager=True)
        )
        mx = obs.get["mx"]
        if mx is None or mx <= 0.0:
            return vertices.withColumn("s", F.lit(0.0))
        return vertices.join(raw, "url", "left").select(
            "url",
            (F.coalesce(F.col("g"), F.lit(0.0)) / F.lit(float(mx))).alias("s"),
        )

    def _residual(new_hub, old_hub, new_auth, old_auth):
        return (
            new_hub.withColumnRenamed("s", "nh")
            .join(old_hub.withColumnRenamed("s", "oh"), "url")
            .join(new_auth.withColumnRenamed("s", "na"), "url")
            .join(old_auth.withColumnRenamed("s", "oa"), "url")
            .agg(
                F.max(
                    F.greatest(
                        F.abs(F.col("nh") - F.col("oh")),
                        F.abs(F.col("na") - F.col("oa")),
                    )
                )
            )
            .first()[0]
        )

    iters_done, residual = 0, None
    track_residual = eps > 0.0  # fixed-iteration (oracle) mode skips it
    prev_hub, prev_auth = hub, auth
    for it in range(max_iter):
        iters_done = it + 1
        new_auth = _gather(hub, "src", "dst", f"hits-a-{it}")
        new_hub = _gather(new_auth, "dst", "src", f"hits-h-{it}")
        if track_residual:
            residual = _residual(new_hub, hub, new_auth, auth)
        prev_hub, prev_auth = hub, auth
        hub, auth = new_hub, new_auth
        if track_residual and residual is not None and residual < eps:
            break
    if stats is not None:
        stats["iterations"] = iters_done
        if not track_residual and max_iter > 0:
            # fixed-iteration mode computes the terminal residual once,
            # after the loop, only when the caller asked to observe it
            residual = _residual(hub, prev_hub, auth, prev_auth)
        stats["residual"] = residual
    return (
        vertices.join(hub.withColumnRenamed("s", "hub"), "url")
        .join(auth.withColumnRenamed("s", "authority"), "url")
        .select("url", "hub", "authority")
    )
