"""SQL-as-data introspection (SURVEY.md §2.9): statement classification,
per-clause feature counting, workload fingerprinting."""

from .parser import classify_statement, extract_sql_features, parameterize_sql

__all__ = ["classify_statement", "extract_sql_features", "parameterize_sql"]
