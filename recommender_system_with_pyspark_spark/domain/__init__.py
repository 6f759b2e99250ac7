"""Reference-domain (BoardGameGeek-shaped) pipelines — SURVEY §3 E1-E3
re-expressed as single lazy DAGs over the operator library."""
