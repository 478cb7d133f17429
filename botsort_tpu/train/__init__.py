"""Training utilities (ReID fine-tuning) — a capability beyond the
inference-only reference, used to adapt the appearance encoders to new
domains (the reference ships separate mot17/mot20-trained weights;
retraining them requires the upstream FastReID torch stack)."""
