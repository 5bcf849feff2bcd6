"""Ingest layer (SURVEY.md §2.1): profile log rendering + parsing."""
