"""Small host utilities (logging, timing)."""
