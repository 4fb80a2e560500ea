"""Druid data-model layer (SURVEY.md §7 Phase C)."""
