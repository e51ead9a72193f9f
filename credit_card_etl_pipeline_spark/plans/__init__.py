"""End-to-end pipelines: extract → refine → load → analytics."""
