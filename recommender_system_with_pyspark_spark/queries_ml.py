"""ML query surface (rows-only checks) — filled in as operators land."""
