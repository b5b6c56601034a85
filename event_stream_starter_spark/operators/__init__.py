"""Reusable relational operators (SURVEY.md §2.4-§2.9 families).

Each operator is a DataFrame→DataFrame transformation built from Catalyst
built-ins. Nothing here collects to the driver; everything scales by
partitioning on the operator's key.
"""
