"""Structured Streaming surface (SURVEY §2.11 — absent in the
reference, which is pure batch; new engine capability)."""
