"""Placeholder — filled in by build phases (SURVEY.md §7)."""
