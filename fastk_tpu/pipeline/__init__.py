"""End-to-end counting pipelines (single-chip and sharded)."""
