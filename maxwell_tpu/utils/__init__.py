"""Utilities: checkpointing, profiling/metrics (SURVEY.md §5)."""
