"""Relational + ML-data operators built on DataFrame primitives."""
