"""Pure-numpy oracle of the reference tracker math.

Fresh implementations (not copies) of the algorithms in
/root/reference/demo_bottrack_onnx_tflite.py, written directly from the
published equations so that the TPU package can be validated against the
exact same numerics the reference computes: full 8x8 Kalman equations,
looped IoU, scipy-based Jonker-Volgenant assignment with lap.lapjv's
extend_cost/cost_limit semantics, and a dynamic-list BoT-SORT cascade.
"""
