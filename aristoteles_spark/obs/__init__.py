"""Observability: Prometheus textfile metrics."""
