"""End-to-end pipelines composing the operator library (SURVEY.md §3)."""
