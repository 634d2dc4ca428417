"""Distributed spatial operators (SURVEY.md §2.4–§2.6)."""
