from .fibonacci import FibonacciAir  # noqa: F401
from .multiset_air import MultisetAir  # noqa: F401
