"""Structured Streaming layer: event bus semantics over file streams."""
