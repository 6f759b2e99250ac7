"""Structured Streaming operators (engine extension — SURVEY §2.9 note)."""
