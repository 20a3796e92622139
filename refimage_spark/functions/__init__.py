"""Scalar/vectorized functions: extraction, hashing, text features."""
