"""Stateful per-key operators: last-writer-wins resolution, tx metadata, dedup."""
