"""Plan-tree navigation and rendering (SURVEY.md §2.1 S12, §2.3 J4)."""
