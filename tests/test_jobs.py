"""Downstream jobs (indexer / pagerank / tfidf / search) vs in-test oracles.

Each Spark plan is checked against an independent pure-Python computation
built from the byte-exact javaport kernels (indexer, tfidf, graph), a
closed-form power iteration (pagerank), or hand-computed expectations
(search scoring).
"""

from __future__ import annotations

import math

import pytest

from distributed_web_search_engine_crawler_indexing_pagerank__spark import webgen
from distributed_web_search_engine_crawler_indexing_pagerank__spark.javaport.links import (
    extract_links,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.javaport.textextract import (
    extract_body_text_for_index,
    extract_body_text_tfidf,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.javaport.tokenize import (
    index_words,
    tokenize_counts,
)
from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans import (
    indexer,
    pagerank as pr,
    search as srch,
    tfidf as tfidf_mod,
)

SEED, N_HOSTS, PAGES_BASE = 3, 4, 6


@pytest.fixture(scope="module")
def pages_pd():
    pages, _, _ = webgen.gen_web_local(SEED, N_HOSTS, PAGES_BASE)
    return pages


@pytest.fixture(scope="module")
def pages_df(spark, pages_pd):
    return spark.createDataFrame(pages_pd).cache()


def test_indexer_matches_python_oracle(pages_df, pages_pd):
    got = {
        r["word"]: (tuple(r["urls"]), r["df"])
        for r in indexer.build_index(pages_df).collect()
    }
    # oracle
    eligible = [
        (row["url"], row["html"].decode())
        for _, row in pages_pd.iterrows()
        if len(row["html"]) >= indexer.MIN_PAGE_BYTES
    ]
    n_docs = len(eligible)
    cap = int(min(indexer.MAX_URLS_PER_WORD, max(1, int(n_docs * indexer.MAX_DOC_FRACTION))))
    postings: dict[str, list[str]] = {}
    for url, html in eligible:
        text = extract_body_text_for_index(html[: indexer.MAX_HTML_BYTES])
        for w in index_words(text):
            postings.setdefault(w, []).append(url)
    expected = {
        w: (tuple(sorted(urls)[:cap]), len(urls)) for w, urls in postings.items()
    }
    assert got == expected
    assert len(got) > 10


def test_indexer_resume_markers(spark, pages_df, tmp_path_factory):
    """I5: a run killed mid-way resumes from chunk markers and never
    re-extracts committed chunks; the result equals the one-shot build."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import (
        Catalog,
    )

    cat = Catalog(str(tmp_path_factory.mktemp("idxcat")))
    first = indexer.ResumableIndexer(spark, cat, n_chunks=4)

    # simulate a crash: index only chunks 0-1, then "die" before finalize
    chunk_of = indexer.F.pmod(indexer.F.xxhash64(indexer.F.col("url")), indexer.F.lit(4))
    for chunk in (0, 1):
        pairs = indexer.indexable_words(
            pages_df.where(chunk_of == chunk)
        ).withColumn("chunk", indexer.F.lit(chunk))
        cat.write(
            first.PAIRS_TABLE,
            pairs,
            mode="append",
            properties={"done_chunks": list(range(chunk + 1))},
        )
    with pytest.raises(RuntimeError, match="chunks not yet indexed"):
        first.finalize(pages_df)

    # fresh process: resume picks up the markers
    resumed = indexer.ResumableIndexer(spark, cat, n_chunks=4)
    assert resumed.done_chunks() == {0, 1}
    snaps_before = len(cat.snapshots(resumed.PAIRS_TABLE))
    final = resumed.run(pages_df)
    # only the two missing chunks committed — done ones were not redone
    assert len(cat.snapshots(resumed.PAIRS_TABLE)) == snaps_before + 2
    assert resumed.done_chunks() == {0, 1, 2, 3}

    got = {r["word"]: (tuple(r["urls"]), r["df"]) for r in final.collect()}
    want = {
        r["word"]: (tuple(r["urls"]), r["df"])
        for r in indexer.build_index(pages_df).collect()
    }
    assert got == want
    # finalize is idempotent after completion
    again = resumed.finalize(pages_df)
    assert again.count() == len(want)


def test_pagerank_closed_form(spark):
    """4-node graph with a dangling node; compare to a numpy power
    iteration implementing the reference update rule exactly."""
    edges = {
        "a": ["b", "c"],
        "b": ["c"],
        "c": ["a"],
        "d": [],  # dangling
    }
    graph = spark.createDataFrame(
        [(s, None, None, ds) for s, ds in edges.items()],
        "src string, title string, snippet string, dests array<string>",
    )
    ranks = {r["url"]: r["rank"] for r in pr.pagerank(graph).collect()}

    # oracle power iteration (PageRank.java:299-315 update + L∞ stop)
    nodes = sorted(edges)
    n = len(nodes)
    d = pr.DAMPING
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(pr.MAX_ITERATIONS):
        inbound = {v: 0.0 for v in nodes}
        dangling = 0.0
        for v in nodes:
            dests = set(edges[v])
            if not dests:
                dangling += rank[v]
                continue
            # share divides by ALL distinct dests (known or not); only
            # known vertices gather (reference drops unknown at P7).
            share = rank[v] / len(dests)
            for x in dests:
                if x in inbound:
                    inbound[x] += share
        new = {
            v: (1 - d) / n + d * inbound[v] + d * dangling / n for v in nodes
        }
        residual = max(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if residual < pr.CONVERGENCE:
            break

    assert set(ranks) == set(nodes)
    for v in nodes:
        assert ranks[v] == pytest.approx(rank[v], abs=1e-9)
    assert sum(ranks.values()) == pytest.approx(1.0, abs=0.01)


def test_pagerank_iteration_resume(spark, tmp_path_factory):
    """P-resume (pt-pagerank-progress analogue): a run killed mid-way
    restarts from the last committed iteration and converges to exactly
    the uninterrupted run's ranks."""
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.catalog import (
        Catalog,
    )

    edges = {"a": ["b", "c"], "b": ["c"], "c": ["a"], "d": []}
    graph = spark.createDataFrame(
        [(s, None, None, ds) for s, ds in edges.items()],
        "src string, title string, snippet string, dests array<string>",
    )
    want = {r["url"]: r["rank"] for r in pr.pagerank(graph).collect()}

    cat = Catalog(str(tmp_path_factory.mktemp("prcat")))
    # "crash" after 4 of 20 iterations (checkpoint at iteration 4)
    pr.pagerank(graph, max_iter=4, catalog=cat, checkpoint_every=4)
    snap = cat.current_snapshot("pagerank_ranks")
    assert int(snap.properties["iteration"]) == 4
    # fresh call resumes at iteration 4, not from 1/N
    got = {
        r["url"]: r["rank"]
        for r in pr.pagerank(graph, catalog=cat, checkpoint_every=4).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    # converged state is durable: a third call short-circuits via the
    # residual property without iterating
    final_snap = cat.current_snapshot("pagerank_ranks")
    assert float(final_snap.properties["residual"]) < pr.CONVERGENCE
    again = {
        r["url"]: r["rank"]
        for r in pr.pagerank(graph, catalog=cat).collect()
    }
    assert again == pytest.approx(got)


def test_build_graph_matches_kernel(pages_df, pages_pd):
    got = {r["src"]: list(r["dests"]) for r in pr.build_graph(pages_df).collect()}
    for _, row in pages_pd.sample(n=10, random_state=1).iterrows():
        expected = sorted(extract_links(row["url"], row["html"].decode()))
        assert got[row["url"]] == expected


def test_tfidf_matches_python_oracle(pages_df, pages_pd):
    index_df = indexer.build_index(pages_df)
    got = {
        (r["url"], r["word"]): (r["tf"], r["idf"], r["tfidf"])
        for r in tfidf_mod.tfidf(pages_df, index_df).collect()
    }
    # oracle
    n_docs = len(pages_pd)
    df_counts: dict[str, int] = {}
    eligible = [
        (row["url"], row["html"].decode())
        for _, row in pages_pd.iterrows()
        if len(row["html"]) >= indexer.MIN_PAGE_BYTES
    ]
    for url, html in eligible:
        text = extract_body_text_for_index(html[: indexer.MAX_HTML_BYTES])
        for w in index_words(text):
            df_counts[w] = df_counts.get(w, 0) + 1
    expected = {}
    for _, row in pages_pd.iterrows():
        counts = tokenize_counts(extract_body_text_tfidf(row["html"].decode()))
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            : tfidf_mod.MAX_TERMS_PER_DOCUMENT
        ]
        for w, c in top:
            if w not in df_counts:
                continue
            tf = 1.0 + math.log(c)
            idf = math.log((n_docs + 1.0) / (df_counts[w] + 1.0))
            if idf > 0 and tf * idf > 0:
                expected[(row["url"], w)] = (tf, idf, tf * idf)
    assert set(got) == set(expected)
    for k, (tf, idf, ti) in expected.items():
        assert got[k][0] == pytest.approx(tf, rel=1e-12)
        assert got[k][1] == pytest.approx(idf, rel=1e-12)
        assert got[k][2] == pytest.approx(ti, rel=1e-12)


def test_search_and_semantics_and_ranking(spark):
    index = spark.createDataFrame(
        [
            ("apple", ["u1", "u2", "u3"], 3),
            ("banana", ["u1", "u2"], 2),
            ("cherry", ["u9"], 1),
        ],
        "word string, urls array<string>, df long",
    )
    tfidf = spark.createDataFrame(
        [
            ("u1", "apple", 0.5),
            ("u1", "banana", 0.7),
            ("u2", "apple", 0.1),
            ("u2", "banana", 0.1),
        ],
        "url string, word string, tfidf double",
    ).select("url", "word", F_lit0("tf"), F_lit0("idf"), "tfidf")
    pageranks = spark.createDataFrame(
        [
            ("u1", "Apple banana pie", "s1", 0.4),
            ("u2", "Something else", "s2", 0.4),
            ("u3", "Only apple", "s3", 0.9),
        ],
        "url string, title string, snippet string, pagerank double",
    )
    res = srch.search("apple banana", index, tfidf, pageranks).collect()
    urls = [r["url"] for r in res]
    # AND semantics: u3 matches only 'apple' → excluded
    assert set(urls) == {"u1", "u2"}
    # u1 has higher tfidf avg + title hits → ranks first
    assert urls[0] == "u1"
    # scores computed per the reference formula
    s1 = 0.45 * math.log(1.4) + 0.45 * 0.6 + 0.07 * 1.0 + 0.03 * 0.0
    assert res[0]["score"] == pytest.approx(s1, rel=1e-9)

    assert srch.spellcheck("aple", index) == "apple"
    assert srch.autocomplete("ap", index) == ["apple"]
    assert srch.tokenize_query("the apple AND banana") == ["apple", "banana"]


def test_search_geo_boost(spark):
    """Q8: bbox city inference + ×(1+0.2·geo) multiplier
    (ResultPageHandler.java:156-176, 331-385)."""
    index = spark.createDataFrame(
        [("apple", ["u1", "u2"], 2)], "word string, urls array<string>, df long"
    )
    tfidf = spark.createDataFrame(
        [("u1", "apple", 0.0, 0.0, 0.5), ("u2", "apple", 0.0, 0.0, 0.5)],
        "url string, word string, tf double, idf double, tfidf double",
    )
    pageranks = spark.createDataFrame(
        [
            ("u1", "Visit New York apple guide", "s1", 0.4),
            ("u2", "apple elsewhere", "s2", 0.4),
        ],
        "url string, title string, snippet string, pagerank double",
    )
    plain = {r["url"]: r["score"] for r in srch.search("apple", index, tfidf, pageranks).collect()}
    # NYC probe point → city "new york" → only u1's title matches
    boosted = {
        r["url"]: r["score"]
        for r in srch.search("apple", index, tfidf, pageranks, lat=40.7, lon=-74.0).collect()
    }
    assert boosted["u1"] == pytest.approx(plain["u1"] * 1.2, rel=1e-12)
    assert boosted["u2"] == pytest.approx(plain["u2"], rel=1e-12)
    # outside every bbox → no city → no boost anywhere
    miss = {
        r["url"]: r["score"]
        for r in srch.search("apple", index, tfidf, pageranks, lat=47.6, lon=-122.33).collect()
    }
    assert miss == pytest.approx(plain)
    # first-match-wins on the overlapping SF/Oakland lat band
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.search import (
        infer_city_keyword,
    )
    from pyspark.sql import functions as F

    one = spark.range(1)
    got = one.select(
        infer_city_keyword(F.lit(37.77), F.lit(-122.42)).alias("sf"),
        infer_city_keyword(F.lit(37.80), F.lit(-122.20)).alias("oak"),
        infer_city_keyword(F.lit(40.0), F.lit(-75.1)).alias("philly"),
        infer_city_keyword(F.lit(0.0), F.lit(0.0)).alias("none"),
    ).first()
    assert (got["sf"], got["oak"], got["philly"], got["none"]) == (
        "San Francisco",
        "Oakland",
        "Philadelphia",
        None,
    )


def F_lit0(name):
    from pyspark.sql import functions as F

    return F.lit(0.0).alias(name)


def test_pagerank_incremental_same_fixpoint_fewer_passes(spark):
    """Warm-start rank maintenance (pagerank_incremental): after the
    graph grows 4%, (a) the warm-started run converges to the SAME
    ranks as a cold full recompute (unique fixpoint of the damped
    contraction), (b) at the reference's production tolerance
    eps=0.001 it needs strictly fewer full-graph passes than cold, and
    (c) the mass-normalized seed sums to 1 even though the partial
    graph's fixpoint leaks mass through not-yet-crawled dests."""
    from pyspark.sql import functions as F

    M = 250  # fixed link universe: out-edges never change as n grows

    def graph(n):
        return spark.range(n).select(
            F.col("id").cast("string").alias("src"),
            F.array(
                ((F.col("id") * F.col("id") + 1) % M).cast("string"),
                ((F.col("id") * 3 + 2) % M).cast("string"),
            ).alias("dests"),
        )

    eps = pr.CONVERGENCE  # the reference's 0.001
    s_base, s_cold, s_warm = {}, {}, {}
    base = pr.pagerank(graph(240), eps=eps, max_iter=50, stats=s_base)
    # partial-crawl fixpoint leaks mass (edges to uncrawled dests drop)
    base_mass = base.agg(F.sum("rank")).first()[0]
    assert base_mass < 0.999

    cold = pr.pagerank(graph(250), eps=eps, max_iter=50, stats=s_cold)
    warm = pr.pagerank_incremental(
        graph(250), base, eps=eps, max_iter=50, stats=s_warm
    )
    assert 0 < s_warm["iterations"] < s_cold["iterations"]

    # both stopped at the same tolerance -> same fixpoint within the
    # contraction bound d/(1-d)*eps of each other
    diff = (
        warm.withColumnRenamed("rank", "w")
        .join(cold.withColumnRenamed("rank", "c"), "url")
        .agg(F.max(F.abs(F.col("w") - F.col("c"))))
        .first()[0]
    )
    assert diff < eps * pr.DAMPING / (1 - pr.DAMPING)

    # run both deeper: they approach the identical fixpoint
    cold9 = pr.pagerank(graph(250), eps=1e-9, max_iter=200)
    warm9 = pr.pagerank_incremental(graph(250), base, eps=1e-9, max_iter=200)
    diff9 = (
        warm9.withColumnRenamed("rank", "w")
        .join(cold9.withColumnRenamed("rank", "c"), "url")
        .agg(F.max(F.abs(F.col("w") - F.col("c"))))
        .first()[0]
    )
    assert diff9 < 1e-7


def test_pagerank_init_ranks_seed_and_empty_prev(spark):
    """init_ranks contract: missing vertices fall back to uniform 1/N;
    an empty/zero previous vector degrades to the cold path instead of
    dividing by zero."""
    from pyspark.sql import functions as F

    graph = spark.createDataFrame(
        [("a", ["b"]), ("b", ["a"]), ("c", ["a"])],
        "src string, dests array<string>",
    )
    # seed only 'a'; b and c fall back to 1/3 — one iteration from that
    # exact vector must match one iteration of a hand-built seed
    seed = spark.createDataFrame([("a", 0.5)], "url string, rank double")
    got = {
        r["url"]: r["rank"]
        for r in pr.pagerank(graph, eps=0.0, max_iter=1, init_ranks=seed).collect()
    }
    d, n = pr.DAMPING, 3
    x = {"a": 0.5, "b": 1 / 3, "c": 1 / 3}
    inbound = {"a": x["b"] + x["c"], "b": x["a"], "c": 0.0}
    want = {v: (1 - d) / n + d * inbound[v] for v in x}
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)

    empty_prev = spark.createDataFrame([], "url string, rank double")
    cold = pr.pagerank(graph, eps=0.0, max_iter=2)
    via_inc = pr.pagerank_incremental(graph, empty_prev, eps=0.0, max_iter=2)
    a = {r["url"]: r["rank"] for r in cold.collect()}
    b = {r["url"]: r["rank"] for r in via_inc.collect()}
    assert a == b


def test_pagerank_personalized_closed_form(spark):
    """Personalized PageRank vs a numpy power iteration of the update
    ``new = ((1-d) + d*dangling)*t_v + d*inbound`` on a 4-node graph
    with a dangling node and a 1-node teleport set: rank concentrates
    on the seed, dangling mass re-enters through t, and vertices
    outside the teleport set are reachable only via links."""
    from pyspark.sql import functions as F

    edges = {"a": ["b", "c"], "b": ["c"], "c": ["a"], "d": []}
    graph = spark.createDataFrame(
        [(s, ds) for s, ds in edges.items()],
        "src string, dests array<string>",
    )
    tele = spark.createDataFrame([("a", 1.0)], "url string, weight double")
    got = {
        r["url"]: r["rank"]
        for r in pr.pagerank(graph, teleport=tele, eps=1e-10, max_iter=200).collect()
    }

    nodes = sorted(edges)
    d = pr.DAMPING
    t = {v: (1.0 if v == "a" else 0.0) for v in nodes}
    rank = dict(t)  # start vector = teleport
    for _ in range(200):
        inbound = {v: 0.0 for v in nodes}
        dangling = 0.0
        for v in nodes:
            dests = set(edges[v])
            if not dests:
                dangling += rank[v]
                continue
            share = rank[v] / len(dests)
            for x in dests:
                if x in inbound:
                    inbound[x] += share
        new = {
            v: ((1 - d) + d * dangling) * t[v] + d * inbound[v] for v in nodes
        }
        residual = max(abs(new[v] - rank[v]) for v in nodes)
        rank = new
        if residual < 1e-10:
            break

    for v in nodes:
        assert got[v] == pytest.approx(rank[v], abs=1e-9)
    # seed holds the most rank; the unlinked dangling node has none
    assert got["a"] == max(got.values()) and got["d"] == 0.0
