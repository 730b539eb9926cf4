"""searchengine_spark — PySpark-native inverted-index + BM25 engine.

A from-scratch, Spark-first rebuild of the query/data capabilities of the
reference full-text search service (``aWatLove/searchengine``, a Go/Bleve
engine; see SURVEY.md). The reference delegates tokenization, inverted
indexing and tf-idf/BM25 scoring to the embedded Bleve library
(reference ``go.mod:11``); here the same observable semantics are
re-expressed as DataFrame plans over a ``transcripts`` table:

- tokenize/normalize: JVM-side ``regexp_extract_all`` (no per-row Python)
- postings build: explode → tf/df/doclen aggregates → per-term sorted,
  delta-gap + varint compressed posting lists (BinaryType)
- query: broadcast query terms → postings scan (term pushdown) → BM25
  (k1=1.2, b=0.75) → top-k (score desc, doc_id asc, k=10)
- filters: reference filter kinds F1–F8 as pushdown predicates
- streaming ingest: Structured Streaming foreachBatch upsert

See SEMANTICS in :mod:`searchengine_spark.semantics` for the pinned,
oracle-checked scoring contract.
"""

__version__ = "0.1.0"
