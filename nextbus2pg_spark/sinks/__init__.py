"""Keyed sinks (SURVEY.md §2.2, §4 custom-work item 1)."""
