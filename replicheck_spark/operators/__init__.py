"""Dedup pipeline stages, each a pure function DataFrame -> DataFrame."""
