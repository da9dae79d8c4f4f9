"""parallel subpackage (populated incrementally)."""
