"""Operator library: every operator from SURVEY.md §2, Spark-first."""
