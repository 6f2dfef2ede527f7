"""Relational / set / aggregation operators (SURVEY.md §2 inventory)."""
