"""Scalar/codec function library (SURVEY §2.10)."""
