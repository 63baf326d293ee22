"""Benchmark harnesses: single-chip roofline/SpMV (repo-root bench.py) and
multi-device scaling (scaling.py) — SURVEY.md §6."""
