"""Source connectors: schema-aware parquet ingestion, WARC crawl
archives."""

from .reader import read_table, nanos_timestamp_columns
from .warc import (read_warc, read_warc_streaming,
                   warc_records_worker_open)

__all__ = ["read_table", "nanos_timestamp_columns", "read_warc",
           "read_warc_streaming", "warc_records_worker_open"]
