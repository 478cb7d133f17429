"""Host-side video I/O and visualization (OpenCV)."""
