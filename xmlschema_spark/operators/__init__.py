"""Set-level and dataset-level operators (identity, stats, drift, dedup,
similarity, text, multimodal, curation, temporal, layout, checks)."""
