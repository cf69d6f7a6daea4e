"""Checkpoint / lineage state for resumable pipeline runs."""
