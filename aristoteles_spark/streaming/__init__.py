"""Structured Streaming operators.

The reference's incremental model is completeness-gated batch (SURVEY.md
§2.9 — aristoteles/aristoteles.py:296-327 holds a day until all stations
report 288 samples, which Spark watermarks cannot express), so the
*parity* pipeline is scheduled incremental batch (plans/pipeline.py).

This package carries the genuine streaming surface for the engine's
extension workloads: file-source ``readStream`` with
``Trigger.AvailableNow`` (incremental catch-up over a growing directory),
event-time tumbling windows + watermark, and custom stateful processing
via ``applyInPandasWithState``.
"""
