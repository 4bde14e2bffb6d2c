"""Structured Streaming extension (no gensor analogue — SURVEY.md §2.9)."""
