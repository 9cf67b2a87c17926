"""Relational + data-pipeline operators (SURVEY.md §2.2-§2.5, §8)."""
