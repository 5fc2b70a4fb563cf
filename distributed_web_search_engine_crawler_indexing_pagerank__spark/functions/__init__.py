"""Vectorized (Arrow/pandas) column functions for the engine.

``udfs`` — pandas-UDF wrappers of the byte-exact javaport kernels
(canonicalize / hash / robots / extract / tokenize). ``text`` — language
ID, quality scoring, token counting, fingerprinting. ``dedup`` — minhash /
simhash / shingle kernels. All cross the JVM↔Python boundary in Arrow
batches only (BASELINE.json input_hint: no per-row Python).
"""
