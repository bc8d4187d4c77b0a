from . import extract, mesh

__all__ = ["extract", "mesh"]
