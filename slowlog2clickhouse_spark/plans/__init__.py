"""End-to-end pipelines (ingest → classes → sink)."""
