from . import scalars, text

__all__ = ["scalars", "text"]
