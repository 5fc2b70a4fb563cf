"""Composed training-data curation funnel.

One callable chaining the individually-oracled curation operators in the
order a 100-TB pretraining corpus pass runs them, cheapest-first so each
stage shrinks the input of the next:

    quality filter  →  benchmark decontamination (drop flagged + held-out)
    →  exact dedup  →  near-dup clustering (shingle Jaccard → connected
    components, canonical member kept)  →  per-language stratified quota

The reference engine has no curation surface (it is a crawl/index/search
system); this module is part of the beyond-reference LLM-data-pipeline
coverage (SURVEY.md §2). Every stage is a pure DataFrame composition —
scale behavior (broadcast eval shingles, hot-shingle df cap, star-
contraction components) lives in the member operators, not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import dedup, textops

__all__ = ["curate_funnel"]


def curate_funnel(
    docs: DataFrame,
    eval_ids: DataFrame,
    min_jaccard: float = 0.2,
    min_overlap: int = 5,
    quota: int = 40,
    id_col: str = "doc_id",
) -> dict[str, DataFrame]:
    """→ dict of the funnel's stage outputs (all lazy):

    - ``quality``: input rows surviving :func:`textops.quality_filter`
    - ``clean``: quality rows minus contaminated rows AND minus the
      held-out eval rows themselves (held-out data never trains)
    - ``exact``: clean rows minus exact-fingerprint duplicates
    - ``neardup``: exact rows minus non-canonical members of each
      near-duplicate component (shingle Jaccard ≥ ``min_jaccard``,
      component = min reachable id; the canonical member is kept)
    - ``sampled``: per-language ``quota`` rows, deterministic md5 order
      — (doc_id, lang), the funnel's final output
    """
    keep_q = textops.quality_filter(docs).where(F.col("keep")).select(id_col)
    docs_q = docs.join(keep_q, id_col)

    cont = dedup.contamination(docs_q, eval_ids, min_overlap=min_overlap)
    clean_ids = cont.where(~F.col("contaminated")).select(id_col)
    docs_c = docs_q.join(clean_ids, id_col).join(
        F.broadcast(eval_ids.select(id_col)), id_col, "left_anti"
    )

    ex = dedup.exact_dedup(docs_c)
    docs_e = docs_c.join(ex.where(~F.col("is_dup")).select(id_col), id_col)

    pairs = dedup.ngram_jaccard_pairs(docs_e, min_jaccard=min_jaccard)
    comp = dedup.dup_components(pairs, id_a="doc_a", id_b="doc_b")
    drop = comp.where(F.col("vec_id") != F.col("component")).select(
        F.col("vec_id").alias(id_col)
    )
    docs_n = docs_e.join(drop, id_col, "left_anti")

    sampled = textops.stratified_sample(docs_n, quota=quota)
    return {
        "quality": docs_q,
        "clean": docs_c,
        "exact": docs_e,
        "neardup": docs_n,
        "sampled": sampled,
    }
