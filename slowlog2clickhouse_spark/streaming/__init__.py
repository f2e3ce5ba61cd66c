"""Structured Streaming variants of the core pipeline."""
