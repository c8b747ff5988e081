"""Placeholder — filled in by a later milestone (SURVEY §7.1)."""
