"""Golden oracle: a pure-Python reference crawler simulator.

The reference repo ships no tests (SURVEY.md §5); running its Java cluster
is out of scope. The oracle reimplements ``src/jobs/Crawler.java``'s
frontier semantics exactly (via the byte-exact javaport kernels) under the
deterministic wave-quantized model spec'd in ``simulator.py``, and the
Spark crawl plan must match its fetch schedule, URL-seen set, and crawl
table row-for-row.
"""
