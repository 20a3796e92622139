"""Relational + retrieval operators (SURVEY.md §2)."""
