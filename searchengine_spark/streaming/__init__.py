from .ingest import StreamingIndex, message_schema  # noqa: F401
