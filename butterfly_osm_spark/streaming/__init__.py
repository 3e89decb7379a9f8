"""Structured Streaming ingestion ops — see ingest.py."""

from .ingest import read_image_stream, streaming_cell_counts, streaming_dedup  # noqa: F401
