"""Data sources: SQLite station archives, driver test parquet tables."""
