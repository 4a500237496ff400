"""Ingestion: batch index tasks and segment-maintenance operations
(reference: arch/indexing-service/*), plus Structured Streaming realtime
ingest (reference: arch/druid-arch.md:29-32, data-ingest/kis.md)."""
