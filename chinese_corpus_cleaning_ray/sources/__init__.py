"""Sources: Parquet transcript readers and the deterministic synthetic
transcript generator (no external data — FIXTURES.md)."""
