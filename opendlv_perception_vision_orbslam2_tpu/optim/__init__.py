"""Nonlinear least squares: pose LM, bundle adjustment, pose-graph."""
