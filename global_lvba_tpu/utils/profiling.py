"""Device profiling — first-class replacement for the reference's ad-hoc
std::chrono prints (SURVEY.md §5): wraps the JAX profiler so any pipeline
region can be traced and inspected with TensorBoard/XProf."""

from __future__ import annotations

from contextlib import contextmanager
from pathlib import Path


@contextmanager
def device_trace(out_dir: str):
    """Capture a JAX profiler trace of the enclosed region."""
    import jax

    Path(out_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(out_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
