from .catalog import TABLES, Catalog, load_table, register_views

__all__ = ["TABLES", "Catalog", "load_table", "register_views"]
