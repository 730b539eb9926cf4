from .bm25 import bm25_score_expr, corpus_stats, search_direct, term_frequencies  # noqa: F401
