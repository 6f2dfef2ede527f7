"""Column-expression featurization + shared deterministic hash functions."""
