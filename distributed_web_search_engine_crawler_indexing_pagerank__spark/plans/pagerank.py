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

__all__ = ["build_graph", "pagerank", "DAMPING", "MAX_OUT_LINKS"]

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
) -> DataFrame:
    """→ (url, rank): P2–P6 as distributed joins. Vertices = graph sources
    (the reference seeds ranks from the graph table, :229-272).

    Iteration resume (the reference's ``pt-pagerank-progress`` markers,
    PageRank.java:33-47): pass ``catalog`` to commit the rank vector with
    {iteration, residual, dangling} snapshot properties every
    ``checkpoint_every`` iterations; a restarted call with the same
    catalog resumes from the last committed iteration instead of
    re-running the chain from 1/N. Rank trajectories are deterministic,
    so resumed and uninterrupted runs converge identically."""
    spark = graph.sparkSession
    vertices = graph.select(F.col("src").alias("url")).distinct().localCheckpoint(eager=True)
    n = vertices.count()
    if n == 0:
        return vertices.withColumn("rank", F.lit(0.0))
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
    n_dangling = flags.where(~F.col("has_out")).count()
    # initial ranks are uniform 1/n; a resumed run restored its dangling
    # mass from the snapshot properties
    dangling = resumed_dangling if resumed_dangling is not None else n_dangling / n

    for it in range(start_iter, max_iter):
        contribs = (
            edges.join(outdeg, "src")
            .join(ranks.withColumnRenamed("url", "src"), "src")
            .select(F.col("dst").alias("url"), (F.col("rank") / F.col("outdeg")).alias("c"))
            .join(vertices, "url", "left_semi")
            .groupBy("url")
            .agg(F.sum("c").alias("inbound"))
        )
        new_ranks = (
            vertices.join(contribs, "url", "left")
            .select(
                "url",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d) * F.coalesce(F.col("inbound"), F.lit(0.0))
                    + F.lit(d * dangling / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)  # cut lineage per iteration (P6)
        )
        # one action: L∞ residual + next iteration's dangling mass
        stats = (
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), "url")
            .join(flags, "url")
            .agg(
                F.max(F.abs(F.col("rank") - F.col("old"))).alias("res"),
                F.sum(F.when(~F.col("has_out"), F.col("rank")).otherwise(0.0)).alias(
                    "dang"
                ),
            )
            .first()
        )
        residual, dangling = stats["res"], stats["dang"] or 0.0
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
    return ranks


def pageranks_table(pages: DataFrame, ranks: DataFrame) -> DataFrame:
    """Serving table (url, title, snippet, pagerank) — P7 (:183-185,401-411)."""
    graph = build_graph(pages)
    return (
        graph.select("src", "title", "snippet")
        .withColumnRenamed("src", "url")
        .join(ranks, "url")
        .withColumnRenamed("rank", "pagerank")
    )
