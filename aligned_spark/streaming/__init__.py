"""Structured Streaming port of the reference's micro-batch stream
worker (SURVEY.md §2.9)."""
