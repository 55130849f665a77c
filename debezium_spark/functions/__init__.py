"""Column-algebra function library: envelopes, SMT-equivalents, text/dedup/similarity."""
