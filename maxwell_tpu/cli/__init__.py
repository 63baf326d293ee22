"""Driver / CLI (SURVEY.md §2 C17): select problem, solver, tolerances via
JSON configs; one config per BASELINE.json workload (configs/config{1..5})."""
