"""Logging, stats, and synthetic-data utilities."""
