"""Runtime: the CDC engine (batch replay + Structured Streaming), metrics, lineage."""
