from .logging import get_logger, setup_logging
from .progress import progress_bar
from .metrics import StageTimer, MetricsRegistry
from .checkpoint import StageCheckpoint

__all__ = [
    "get_logger",
    "setup_logging",
    "progress_bar",
    "StageTimer",
    "MetricsRegistry",
    "StageCheckpoint",
]
