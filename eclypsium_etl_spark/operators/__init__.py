"""Relational operators, one module per SURVEY.md §2 group."""
