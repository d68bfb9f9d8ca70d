"""Structured Streaming realizations of the reference's incremental
semantics (SURVEY.md §2.9 T1-T7)."""
