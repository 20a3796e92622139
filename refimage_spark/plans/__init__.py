"""Logical query tree -> DataFrame plan compilation."""
