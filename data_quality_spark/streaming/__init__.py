"""Structured Streaming ingest mode for the quality pipeline."""
