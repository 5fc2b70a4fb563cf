"""Spark-first job plans.

``crawl`` — the north-star frontier/fetch scheduler (micro-iterations over
snapshot-versioned tables). ``bloom`` — partitioned Bloom URL-seen shards.
``indexer`` / ``pagerank`` / ``tfidf`` / ``search`` — the downstream jobs
proving the operator surface of SURVEY.md §2.4/§2.5.
"""
