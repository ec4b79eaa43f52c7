"""Relational + domain operators (SURVEY.md §2.2–§2.7, §2.9, plus the
training-data-pipeline extensions: dedup, similarity, text analysis,
multimodal)."""
