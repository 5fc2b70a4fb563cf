"""HITS (plans/hits.py): closed-form trajectory equality vs a pure-Python
max-norm power iteration, boundary vertices, and convergence stats."""

from __future__ import annotations

import pytest


def _py_hits(edges: dict[str, list[str]], iters: int):
    nodes = sorted(edges)
    known = set(nodes)
    es = sorted(
        {(s, t) for s, ds in edges.items() for t in ds if t in known}
    )
    hub = {v: 1.0 for v in nodes}
    auth = {v: 1.0 for v in nodes}
    for _ in range(iters):
        raw_a = {v: 0.0 for v in nodes}
        for s, t in es:
            raw_a[t] += hub[s]
        m = max(raw_a.values())
        auth = {v: (raw_a[v] / m if m > 0 else 0.0) for v in nodes}
        raw_h = {v: 0.0 for v in nodes}
        for s, t in es:
            raw_h[s] += auth[t]
        m = max(raw_h.values())
        hub = {v: (raw_h[v] / m if m > 0 else 0.0) for v in nodes}
    return hub, auth


def test_hits_matches_python_oracle_with_boundary_vertices(spark):
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.hits import hits

    edges = {
        "hub1": ["authA", "authB", "authC"],  # pure hub
        "hub2": ["authA", "authB"],
        "authA": ["hub1"],
        "authB": [],                          # pure authority (no out)
        "authC": ["nowhere"],                 # edge to unknown dst drops
        "lone": [],                           # no in, no out -> both 0
    }
    graph = spark.createDataFrame(
        [(s, ds) for s, ds in edges.items()],
        "src string, dests array<string>",
    )
    got = {
        r["url"]: (r["hub"], r["authority"])
        for r in hits(graph, max_iter=6, eps=0.0).collect()
    }
    want_h, want_a = _py_hits(edges, 6)
    assert set(got) == set(want_h)
    for v in want_h:
        assert got[v][0] == pytest.approx(want_h[v], abs=1e-12)
        assert got[v][1] == pytest.approx(want_a[v], abs=1e-12)
    # max-norm puts the top hub and top authority at exactly 1.0
    assert max(g[0] for g in got.values()) == pytest.approx(1.0)
    assert max(g[1] for g in got.values()) == pytest.approx(1.0)
    assert got["lone"] == (0.0, 0.0)
    assert got["hub1"][0] == 1.0      # links to every authority
    assert got["authB"][0] == 0.0     # no out-links -> zero hub score


def test_hits_converges_and_reports_stats(spark):
    from distributed_web_search_engine_crawler_indexing_pagerank__spark.plans.hits import hits
    from pyspark.sql import functions as F

    n = 60
    graph = spark.range(n).select(
        F.col("id").cast("string").alias("src"),
        F.array(
            ((F.col("id") * F.col("id") + 1) % n).cast("string"),
            ((F.col("id") * 3 + 2) % n).cast("string"),
        ).alias("dests"),
    )
    s = {}
    out = hits(graph, max_iter=50, eps=1e-6, stats=s)
    assert out.count() == n
    assert 0 < s["iterations"] < 50 and s["residual"] < 1e-6
