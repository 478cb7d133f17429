"""Fused per-frame pipeline: preprocess -> detect -> hierarchy -> ReID ->
cascade, as one jitted device program."""
