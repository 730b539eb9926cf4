from .text import doc_id_col, tokenize_col, tokens_no_stop  # noqa: F401
