"""Sources: deterministic WAL/binlog generator, snapshot sources, streaming readers."""
