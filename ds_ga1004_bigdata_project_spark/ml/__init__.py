from . import als, indexing, metrics

__all__ = ["als", "indexing", "metrics"]
