"""Pipeline assembly, skew handling, checkpoint/resume."""
