from .files import read_csv, read_jsonl
from .tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_csv",
    "read_jsonl",
]
