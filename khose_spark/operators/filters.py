"""Placeholder — operators land in later phases."""
