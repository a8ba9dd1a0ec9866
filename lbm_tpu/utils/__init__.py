"""Profiling, debugging and misc utilities."""
