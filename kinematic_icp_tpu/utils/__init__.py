"""Host-side utilities: ingestion, evaluation, synthetic data, profiling."""
