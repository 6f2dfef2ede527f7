"""Table IO: stage catalog with snapshot/fingerprint resume semantics."""
