"""NumPy forward-pass inference kernels (the reference's M1/M2 analogues).

No torch/TF at runtime (SURVEY.md §7 risks): kernels are pure NumPy,
weights constructed deterministically in weights.py, executed inside
Arrow-batched mapInPandas with per-worker lazy weight init.
"""
