"""I/O, visualization, profiling and checkpoint utilities."""

from . import io, plot  # noqa: E402,F401
