"""Geometry and feature kernels (pure JAX + Pallas)."""
