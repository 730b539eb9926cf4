"""Materialized inverted index: build, codec, catalog, query engine."""
