"""Driver-side orchestration: state, day spans, completeness gate, pipeline."""
