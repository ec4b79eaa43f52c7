"""End-to-end pipelines (SURVEY.md §3, entry points E1–E3)."""
