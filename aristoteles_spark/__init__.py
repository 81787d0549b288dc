"""aristoteles_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of chime-experiment/aristoteles
(reference: /root/reference/aristoteles/aristoteles.py, 485 LoC weather ETL)
re-expressed Spark-first: DataFrame/SQL declarative plans, Catalyst
optimization, partitioned columnar sinks, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) the 100 TB north-star workload needs.

Layout:
    sources/    SQLite / Parquet readers with pushdown
    functions/  pure Column->Column expression libraries (units, text, vectors)
    operators/  relational + ML-data operators (dedup, similarity, asof, windows)
    plans/      incremental-batch orchestration (state, day spans, gates)
    sinks/      partitioned parquet daily sink, metadata sidecars, HDF5 compat
    streaming/  Structured Streaming variants of the pipeline
    obs/        Prometheus textfile metrics
    multimodal/ binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.1.0"
