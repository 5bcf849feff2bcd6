"""ML operators (SURVEY.md §2.10): workload clustering."""
