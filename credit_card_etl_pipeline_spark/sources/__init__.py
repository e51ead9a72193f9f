"""Config-driven ingest: source registry, smart CSV/HTML/Excel readers,
and rule-table loaders (SURVEY §2.A)."""
