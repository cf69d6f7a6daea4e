"""End-to-end pipelines built from the stage library."""
