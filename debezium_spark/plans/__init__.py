"""Storage plane: versioned lake table (Iceberg-equivalent semantics) + schema registry."""
