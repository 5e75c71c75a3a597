"""Sink writers (reference §2.2 K1-K9)."""
