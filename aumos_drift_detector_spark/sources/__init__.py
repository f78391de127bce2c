"""Data sources: parquet/CSV readers and deterministic fixture synthesis."""
