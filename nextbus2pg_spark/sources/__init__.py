"""Source adapters (SURVEY.md §2.1)."""
