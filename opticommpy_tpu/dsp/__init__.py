"""dsp subpackage (populated incrementally)."""
