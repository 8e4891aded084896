"""Structured Streaming surface — SURVEY.md §2.9 (T1-T8, S1/S9/S12) plus the
watermark/window extensions the reference lacks."""
