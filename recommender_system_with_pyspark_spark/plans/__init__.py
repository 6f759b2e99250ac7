"""Physical-plan inspection (SURVEY §4): EXPLAIN surface + assertions."""
