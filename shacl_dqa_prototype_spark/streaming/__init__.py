"""Incremental (Structured Streaming) document ingestion."""
