"""Multi-stream scale-out over a TPU device mesh."""
