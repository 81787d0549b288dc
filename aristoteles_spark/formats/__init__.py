"""Self-contained binary format codecs (no third-party C libraries).

``minihdf5`` — a minimal HDF5 writer/reader implementing the subset of
the public HDF5 File Format Specification needed for the reference's
daily weather files (groups, contiguous 1-D float64 datasets, scalar /
string / small-array attributes).
"""
