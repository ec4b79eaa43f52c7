"""Incremental / streaming semantics (SURVEY.md §2.10 T1–T6)."""
