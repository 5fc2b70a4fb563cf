"""PageRank job (reference: ``src/jobs/PageRank.java``).

Reference flow (SURVEY.md §2.4 P1–P7): per page extract title/snippet and
≤30 outlinks with PageRank's own scanner+normalizer (:504-666,708-816,25);
rank init 1/N (:229-272); per iteration scatter share = rank/|dests| with
dangling mass funneled through a ``__dangling__`` sentinel (:47,325-379),
per-key sum (:286-290), update ``new = (1−d)/N + d·inbound +
d·dangling/N`` with d=0.85, L∞ residual < 0.001 or 20 iterations
(:22-24,278-323).

Anti-patterns NOT ported (SURVEY.md §4.3): the reference fetches each
vertex's rank with a point-``getRow`` per element (:349) and updates ranks
in a driver-side sequential scan (:303-315); here both are distributed
joins/aggregations. Lineage is cut with ``localCheckpoint`` every
iteration (P6 note) so 20 iterations don't stack 20 plans.

Determinism note: the reference caps out-edges at 30 in JVM-hash-set
iteration order (not reproducible); we cap after a lexicographic sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.udfs import pagerank_links_udf, snippet_udf, title_udf

__all__ = [
    "build_graph",
    "pagerank",
    "pagerank_incremental",
    "DAMPING",
    "MAX_OUT_LINKS",
]

DAMPING = 0.85  # PageRank.java:22
CONVERGENCE = 0.001  # :23 (L∞)
MAX_ITERATIONS = 20  # :24
MAX_OUT_LINKS = 30  # :25


def build_graph(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """→ (src, title, snippet, dests array<string>): P1.

    The link kernel already drops self-links and applies the ≤30 cap in
    scan order (PageRank.java:770,25) — content is deterministic; the UDF
    returns it sorted for stable array comparison.
    """
    return pages.select(
        F.col(url_col).alias("src"),
        title_udf(F.col(html_col)).alias("title"),
        snippet_udf(F.col(html_col)).alias("snippet"),
        pagerank_links_udf(F.col(url_col), F.col(html_col)).alias("dests"),
    )


def pagerank(
    graph: DataFrame,
    d: float = DAMPING,
    eps: float = CONVERGENCE,
    max_iter: int = MAX_ITERATIONS,
    catalog=None,
    checkpoint_every: int = 5,
    ranks_table: str = "pagerank_ranks",
    init_ranks: DataFrame | None = None,
    stats: dict | None = None,
    teleport: DataFrame | None = None,
) -> DataFrame:
    """→ (url, rank): P2–P6 as distributed joins. Vertices = graph sources
    (the reference seeds ranks from the graph table, :229-272).

    Iteration resume (the reference's ``pt-pagerank-progress`` markers,
    PageRank.java:33-47): pass ``catalog`` to commit the rank vector with
    {iteration, residual, dangling} snapshot properties every
    ``checkpoint_every`` iterations; a restarted call with the same
    catalog resumes from the last committed iteration instead of
    re-running the chain from 1/N. Rank trajectories are deterministic,
    so resumed and uninterrupted runs converge identically.

    ``init_ranks`` (url, rank) seeds the power iteration from an
    arbitrary vector instead of uniform 1/N — vertices missing from it
    fall back to 1/N (the warm-start hook :func:`pagerank_incremental`
    builds on; a catalog resume takes precedence). The damped iteration
    is a contraction with a unique fixpoint, so ANY start converges to
    the same ranks — the start only changes how many iterations that
    takes. ``stats`` (a caller dict) is filled with the terminal
    {"iterations", "residual"} so callers can observe that.

    ``teleport`` (url, weight; weights should sum to 1 over the vertex
    set) makes this PERSONALIZED PageRank (Haveliwala 2002): the random
    surfer restarts into the weight distribution instead of uniformly,
    so rank concentrates around the seed set — topic- or host-focused
    authority. Update becomes ``new = ((1−d) + d·dangling)·t_v +
    d·inbound``; vertices missing from ``teleport`` get t=0 (reachable
    only through links). The teleport column is folded into the vertex
    frame ONCE — per-iteration cost is identical to the uniform path.
    Default start is the teleport vector itself (``init_ranks``
    overrides)."""
    spark = graph.sparkSession
    vertices = graph.select(F.col("src").alias("url")).distinct().localCheckpoint(eager=True)
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("rank", F.lit(0.0))
    if teleport is not None:
        # one join, once — every iteration reuses the checkpointed column
        vertices = (
            vertices.join(
                teleport.withColumnRenamed("weight", "_t"), "url", "left"
            )
            .select("url", F.coalesce(F.col("_t"), F.lit(0.0)).alias("t"))
            .localCheckpoint(eager=True)
        )
    if init_ranks is not None:
        ranks = (
            vertices.join(init_ranks.withColumnRenamed("rank", "_ir"), "url", "left")
            .select("url", F.coalesce(F.col("_ir"), F.lit(1.0 / n)).alias("rank"))
            .localCheckpoint(eager=True)
        )
    elif teleport is not None:
        ranks = vertices.select("url", F.col("t").alias("rank"))
    else:
        ranks = vertices.withColumn("rank", F.lit(1.0 / n))
    start_iter = 0
    resumed_dangling = None
    if catalog is not None and catalog.exists(ranks_table):
        snap = catalog.current_snapshot(ranks_table)
        if snap is not None and snap.properties.get("iteration"):
            start_iter = int(snap.properties["iteration"])
            resumed_dangling = float(snap.properties["dangling"])
            ranks = catalog.read(spark, ranks_table).localCheckpoint(eager=True)
            if float(snap.properties.get("residual", 1.0)) < eps:
                return ranks

    # edges restricted to known vertices? The reference scatters to any
    # dest hash and only final ranks of graph vertices survive the final
    # join (:401-411) — contributions to unknown dests are dropped there.
    # We drop them up front (inner join at gather time) — same fixpoint.
    edges = (
        graph.select("src", F.explode("dests").alias("dst"))
        .distinct()  # dests is a set in the reference
        .localCheckpoint(eager=True)
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # LOOP-INVARIANT scatter frame (r6): edges ⨝ outdeg and the
    # dst∈vertices restriction do not change across iterations — hoist
    # them out of the loop and checkpoint once, so each iteration is
    # exactly one ranks join + one gather aggregation instead of
    # re-running the outdeg aggregate and the semi-join every pass.
    scatter = (
        edges.join(outdeg, "src")
        .join(vertices.withColumnRenamed("url", "dst"), "dst", "left_semi")
        .select("src", "dst", "outdeg")
        .localCheckpoint(eager=True)
    )

    # per-vertex dangling flag, computed once — lets every iteration fold
    # the NEXT iteration's dangling mass (:366-372) into the residual
    # aggregate: 2 actions/iteration (checkpoint + stats) instead of 3.
    flags = (
        vertices.join(
            outdeg.select(F.col("src").alias("url")).withColumn("_o", F.lit(True)),
            "url",
            "left",
        )
        .select("url", F.coalesce(F.col("_o"), F.lit(False)).alias("has_out"))
        .localCheckpoint(eager=True)
    )
    # initial dangling mass: restored from the snapshot on resume; summed
    # from the seed vector on a warm start; n_dangling/n under uniform 1/n
    n_dangling = flags.where(~F.col("has_out")).count()
    if resumed_dangling is not None:
        dangling = resumed_dangling
    elif init_ranks is not None or teleport is not None:
        dangling = (
            0.0
            if n_dangling == 0
            else (
                ranks.join(flags, "url")
                .where(~F.col("has_out"))
                .agg(F.sum("rank"))
                .first()[0]
                or 0.0
            )
        )
    else:
        dangling = n_dangling / n

    # ONE action per iteration when nothing needs the per-iteration
    # bookkeeping (r6): with eps<=0 (fixed-iteration mode — the oracle
    # queries), no dangling vertices (the mass stays 0 forever), no
    # caller-visible stats and no catalog checkpointing, the residual/
    # dangling pass is dead work — each iteration is exactly the job
    # that materializes the new rank vector. Otherwise the residual +
    # next dangling ride in ONE transient second job (joins over the
    # two checkpointed vectors, discarded after .first()).
    #
    # STATS-GROWTH CONSTRAINT (hard-won): localCheckpoint PRESERVES the
    # checkpointed plan's sizeInBytes estimate, so each iteration's
    # lineage may reference the previous vector ONCE — a first draft
    # fused the residual into the checkpoint job (old ranks joined a 2nd
    # time), which SQUARED the join-product sizeInBytes every iteration;
    # by iteration ~50 the BigInt statistic had 2^50 bits and planning
    # hung in BigInteger.multiply. Keep the bookkeeping job separate
    # (its plan is transient) so the estimate grows linearly.
    lean = (
        eps <= 0.0
        and n_dangling == 0
        and dangling == 0.0
        and stats is None
        and catalog is None
    )

    iters_done, residual = 0, None
    for it in range(start_iter, max_iter):
        iters_done = it + 1 - start_iter
        contribs = (
            scatter.join(ranks.withColumnRenamed("url", "src"), "src")
            .select(F.col("dst").alias("url"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .groupBy("url")
            .agg(F.sum("c").alias("inbound"))
        )
        if teleport is not None:
            # personalized: restart mass lands on t_v, not 1/n; dangling
            # mass re-enters through the same teleport distribution
            upd = (
                F.lit((1.0 - d) + d * dangling) * F.col("t")
                + F.lit(d) * F.coalesce(F.col("inbound"), F.lit(0.0))
            )
        else:
            upd = (
                F.lit((1.0 - d) / n)
                + F.lit(d) * F.coalesce(F.col("inbound"), F.lit(0.0))
                + F.lit(d * dangling / n)
            )
        new_ranks = (
            vertices.join(contribs, "url", "left")
            .select("url", upd.alias("rank"))
            .localCheckpoint(eager=True)  # cut lineage per iteration (P6)
        )
        if not lean:
            # transient bookkeeping job: L∞ residual + next dangling mass
            it_row = (
                new_ranks.join(ranks.withColumnRenamed("rank", "old"), "url")
                .join(flags, "url")
                .agg(
                    F.max(F.abs(F.col("rank") - F.col("old"))).alias("res"),
                    F.sum(
                        F.when(~F.col("has_out"), F.col("rank")).otherwise(0.0)
                    ).alias("dang"),
                )
                .first()
            )
            residual, dangling = it_row["res"], it_row["dang"] or 0.0
        ranks = new_ranks
        converged = residual is not None and residual < eps
        if catalog is not None and (converged or (it + 1) % checkpoint_every == 0):
            catalog.write(
                ranks_table,
                ranks,
                mode="overwrite",
                properties={
                    "iteration": it + 1,
                    "residual": float(residual if residual is not None else 0.0),
                    "dangling": float(dangling),
                },
            )
        if converged:
            break
    if stats is not None:
        stats["iterations"] = iters_done
        stats["residual"] = residual
    return ranks


def pagerank_incremental(
    graph: DataFrame,
    prev_ranks: DataFrame,
    n_prev: int | None = None,
    d: float = DAMPING,
    eps: float = CONVERGENCE,
    max_iter: int = MAX_ITERATIONS,
    stats: dict | None = None,
) -> DataFrame:
    """→ (url, rank): rank maintenance for a CONTINUOUS crawl — after a
    wave adds pages/links, converge the grown graph's ranks by warm-
    starting power iteration from the previous vector instead of from
    uniform 1/N. The damped iteration contracts to a unique fixpoint, so
    the result equals a cold full recompute; only the iteration count
    changes. Per-iteration cost is unchanged (same joins over all
    edges); what's saved is the NUMBER of full-graph passes — the
    scheduling currency of a crawl that re-ranks every few waves.

    Measured regime (synthetic fixed-universe growth graphs): at the
    reference's production tolerance eps=0.001 (PageRank.java:23) the
    warm start reaches convergence in 2–5 iterations vs 8 from cold,
    shrinking as the wave's share of the graph shrinks — the 10^10-page
    case is the ≤2-iteration end. At much deeper tolerances (1e-6+) the
    advantage washes out: both errors align with the slowest eigenmode
    and decay at the same spectral rate, so warm-starting buys the
    startup distance only. Use it for the frequent cheap re-rank;
    schedule an occasional cold run if deep-eps ranks are needed.

    Seed scaling: old vertices seed at ``prev.rank · (n_prev/n)/S_prev``
    and new ones at ``1/n``, so total seed mass is exactly 1 while the
    relative ordering of old pages is preserved. Normalizing by the
    previous vector's ACTUAL mass ``S_prev`` matters: under the
    reference's gather semantics, rank scattered to not-yet-crawled
    dests is dropped (PageRank.java:401-411), so a partial crawl's
    fixpoint sums to <1 — seeding with that deficit costs
    ``log(deficit/eps)/log(1/d)`` extra iterations just to re-fill mass
    through the (1−d)/N teleport, which can exceed the cold budget and
    defeat the warm start entirely (measured: 53 vs 40 iterations at
    eps=1e-9 on a 10%-growth graph even WITH the normalization's
    benefit, 87 without it).
    """
    if n_prev is None:
        n_prev = prev_ranks.count()
    n = graph.select("src").distinct().count()
    if n == 0 or n_prev == 0:
        return pagerank(graph, d=d, eps=eps, max_iter=max_iter, stats=stats)
    s_prev = prev_ranks.agg(F.sum("rank")).first()[0] or 0.0
    if s_prev <= 0.0:
        return pagerank(graph, d=d, eps=eps, max_iter=max_iter, stats=stats)
    seed = prev_ranks.select(
        "url", (F.col("rank") * F.lit((n_prev / n) / s_prev)).alias("rank")
    )
    return pagerank(
        graph, d=d, eps=eps, max_iter=max_iter, init_ranks=seed, stats=stats
    )


def pageranks_table(pages: DataFrame, ranks: DataFrame) -> DataFrame:
    """Serving table (url, title, snippet, pagerank) — P7 (:183-185,401-411)."""
    graph = build_graph(pages)
    return (
        graph.select("src", "title", "snippet")
        .withColumnRenamed("src", "url")
        .join(ranks, "url")
        .withColumnRenamed("rank", "pagerank")
    )
