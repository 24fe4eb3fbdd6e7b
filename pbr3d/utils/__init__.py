"""Shared utilities: visualization, profiling."""
