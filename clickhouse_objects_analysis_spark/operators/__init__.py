"""Custom operators: ClickHouse query features Spark lacks as built-ins,
each implemented as a composition of native DataFrame ops (no Python UDFs
in the relational core — everything stays in whole-stage codegen).

- ``joins``   — ASOF JOIN, ANY JOIN (reference grammar joinOp,
                ClickHouseParser.py:10574-10645).
- ``limits``  — LIMIT n BY cols (:10153), LIMIT WITH TIES (:10241).
- ``totals``  — GROUP BY ... WITH TOTALS (:8931-area).
- ``fill``    — ORDER BY ... WITH FILL [FROM/TO/STEP] + INTERPOLATE
                (:11204, :10080).
- ``dedup``   — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
                embedding-cosine deduplication (LLM-pipeline surface).
- ``similarity`` — brute-force and LSH-bucketed cosine top-k ANN.
- ``text``    — language-ID, quality scoring, token counting,
                fingerprinting.
- ``multimodal`` — binary-column plumbing with stubbed decoders.
"""
