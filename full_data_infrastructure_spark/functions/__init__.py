"""Scalar/semi-structured function surface (SURVEY.md §2.8) and vector math."""
