"""Structured-streaming pipelines (SURVEY.md §2.H)."""
