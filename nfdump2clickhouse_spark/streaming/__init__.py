"""Structured Streaming pipeline (SURVEY §3.2 E2'): file source over a
watched directory → event-time windows/watermarks/dedup → idempotent
foreachBatch sinks; custom stateful session stitching."""
