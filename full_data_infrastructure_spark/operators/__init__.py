"""Operator library — relational, window, quality, dedup, similarity, text,
multimodal, generator, enrichment (SURVEY.md §2 + LLM-data extensions)."""
