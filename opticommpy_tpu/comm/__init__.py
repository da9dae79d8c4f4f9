"""comm subpackage (populated incrementally)."""
