"""Batched TPU-native rigid-body physics (models, kinematics, dynamics, contacts)."""
