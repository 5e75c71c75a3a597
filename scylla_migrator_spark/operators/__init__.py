"""Relational operators: renames, filters, explode, content hash, comparators."""
