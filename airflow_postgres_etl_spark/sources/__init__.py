from .csv_source import list_files, read_tracking_csv
from .json_source import list_json_files, read_jsonl, split_corrupt
from .parquet_source import load_table, load_tables, register_views

__all__ = [
    "list_files",
    "list_json_files",
    "read_jsonl",
    "read_tracking_csv",
    "load_table",
    "load_tables",
    "register_views",
    "split_corrupt",
]
