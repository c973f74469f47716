"""Incremental / streaming ingest for the extraction pipeline."""
