"""Utilities: graph visualization, profiling hooks."""
