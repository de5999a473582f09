from .data import load_test_data
from .trace import trace_function, trace_pop, trace_push, trace_range

__all__ = [
    "load_test_data",
    "trace_function",
    "trace_pop",
    "trace_push",
    "trace_range",
]
