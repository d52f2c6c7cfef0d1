from .build import build_components, TrackSet
from .fuse import fuse_tracks, FuseResult

__all__ = ["build_components", "TrackSet", "fuse_tracks", "FuseResult"]
