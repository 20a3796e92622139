"""Structured Streaming surfaces (extension beyond the reference, which
is synchronous request/response only — SURVEY.md §2.9)."""
