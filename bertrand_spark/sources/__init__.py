"""Source connectors: schema-aware parquet ingestion."""

from .reader import read_table, nanos_timestamp_columns

__all__ = ["read_table", "nanos_timestamp_columns"]
