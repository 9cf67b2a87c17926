"""Event envelope + pipeline stages + orchestration (SURVEY.md §3, §7)."""
