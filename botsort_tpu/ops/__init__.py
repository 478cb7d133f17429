"""TPU-native tracking ops: boxes/IoU, Kalman, NMS, assignment, crops."""
