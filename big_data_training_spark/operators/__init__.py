"""Relational / event-log operators (SURVEY.md §2.1-2.11)."""
