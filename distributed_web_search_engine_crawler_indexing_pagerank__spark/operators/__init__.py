"""Training-data pipeline operators (first-class engine surface).

``textops`` — language ID, quality scoring, token counting, document
fingerprinting. ``dedup`` — exact, n-gram Jaccard, MinHash+LSH, SimHash.
``similarity`` — brute-force cosine top-k + IVF-bucketed ANN.
``multimodal`` — binary media column plumbing (decode stubbed, Spark-side
schema/batching real).

Every operator here is built from JVM-side ``pyspark.sql.functions``
column expressions (whole-stage codegen; no Python in the hot path) and
has a matching ANSI-SQL oracle in ``queries.py`` built from the SAME
module constants, so semantics can't drift between the two.
"""
