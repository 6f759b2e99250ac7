"""ML surface (SURVEY §2.8): feature pipeline, model zoo, tuning, stats."""
