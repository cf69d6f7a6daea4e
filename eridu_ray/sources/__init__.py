"""Sources: deterministic synthetic web-page corpus + parquet IO helpers."""
