from .inspect import describe
from .observability import (
    Tracer,
    build_info,
    format_size,
    get_tracer,
    trace_span,
)

__all__ = [
    "describe",
    "Tracer",
    "build_info",
    "format_size",
    "get_tracer",
    "trace_span",
]
