"""Sinks: partitioned daily parquet with metadata sidecars + HDF5 compat."""
