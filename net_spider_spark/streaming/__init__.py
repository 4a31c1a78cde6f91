"""Structured Streaming surfaces: continuous findings ingest and
incrementally-maintained latest-state views."""
