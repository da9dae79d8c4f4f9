"""kernels subpackage (populated incrementally)."""
