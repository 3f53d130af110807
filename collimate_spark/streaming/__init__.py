"""Structured Streaming — the continuous-ingestion role the reference
delegates to its un-vendored `beam` sibling (README.md:3-4)."""
