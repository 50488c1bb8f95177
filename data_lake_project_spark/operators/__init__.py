"""Operator library (SURVEY.md §2).

Each module re-expresses one family of reference capabilities as a
declarative DataFrame rewrite designed to survive a 100 TB scale-up:

- ``asof``       — nearest-preceding-event association (J2,
                   ``texteExtract.py:95-111``) via union + window,
                   one shuffle, no join explosion.
- ``interval``   — spatial/interval theta-join (J1,
                   ``tableExtract.py:171-197``) via grid bucketing,
                   no cross join.
- ``dedup``      — exact + MinHash-LSH + SimHash + n-gram-Jaccard +
                   embedding-cosine near-dup (north star).
- ``similarity`` — brute-force and LSH-bucketed top-k cosine search.
- ``text``       — tokenize / language-ID / quality score / numeric
                   facts / fingerprints (north star + ``texteExtract``).
- ``grid``       — OCR-box -> table-grid reconstruction
                   (``tableExtract.py:112-200``) as applyInPandas.
- ``deplot``     — chart-to-table linearized-string parser
                   (``activity_test.py:99-112``) as native exprs.
- ``textfacts``  — value/year/sign association
                   (``texteExtract.py:95-129``) as native exprs.
- ``keyword_scan`` — directional first-match page scan
                   (``kpis_search.py:21-54``) as ordered filter+limit.
- ``linkage``    — blocked fuzzy entity resolution (banded
                   Levenshtein verify inside blocking-key blocks).
- ``clustering`` — full-corpus distributed k-means (fused
                   assign + partial-centroid-update scans).
- ``ann_index``  — persisted ANN index lifecycle (train/encode once,
                   search many — the FAISS deployment shape).
- ``dedup_index``— materialized, incrementally-maintained dedup
                   index (O(delta) band/set fold per ingest).
- ``bpe``        — distributed BPE tokenizer training (corpus-sized
                   word count once, vocabulary-sized merge loop).
- ``retrieval``  — exact BM25 / RRF hybrid fusion / IR quality
                   metrics / hard-negative mining (training pairs).
- ``privacy``    — k-anonymity / l-diversity release-gate audit
                   (the governance twin of ``erasure``).
"""
