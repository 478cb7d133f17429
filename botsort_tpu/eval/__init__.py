"""Tracking-quality evaluation (CLEAR-MOT + identity metrics)."""
