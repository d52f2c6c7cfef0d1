from .colmap_db import load_colmap_db

__all__ = ["load_colmap_db"]
