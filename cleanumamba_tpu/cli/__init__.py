"""Command-line drivers (reference src/training/*.py + src/examples/*.py)."""
