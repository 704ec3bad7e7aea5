from . import aggregates, dedup, relational, sampling, similarity

__all__ = ["aggregates", "dedup", "relational", "sampling", "similarity"]
