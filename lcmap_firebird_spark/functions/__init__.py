"""Scalar/aggregate function helpers (SURVEY.md §2.8) plus
oracle-exact arithmetic used by the correctness harness."""
