"""Placeholder module — real implementation arrives with its milestone."""
