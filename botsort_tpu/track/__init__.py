"""Track state store and BoT-SORT association cascade (jittable)."""
