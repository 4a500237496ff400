"""Realtime ingestion via Structured Streaming (SURVEY §2.7)."""
