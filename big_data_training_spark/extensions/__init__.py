"""LLM-data-pipeline extensions (BASELINE.json north_star): dedup,
similarity search, multimodal columns, text analysis — engine additions
beyond the reference surface, designed as pure DataFrame ops so they
scale (no driver-side collection anywhere)."""
