from .testdata import TABLES, register_tables, table_path

__all__ = ["TABLES", "register_tables", "table_path"]
