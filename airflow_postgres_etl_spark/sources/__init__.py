from .csv_source import list_files, read_tracking_csv
from .parquet_source import load_table, load_tables, register_views

__all__ = [
    "list_files",
    "read_tracking_csv",
    "load_table",
    "load_tables",
    "register_views",
]
