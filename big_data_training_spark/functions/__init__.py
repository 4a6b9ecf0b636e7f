"""Scalar / codec / hashing function surface (SURVEY.md §2.10)."""
