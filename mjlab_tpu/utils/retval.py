"""Config-factory decorator (reference utils/retval.py:6)."""

from typing import Callable, TypeVar

T = TypeVar("T")


def retval(func: Callable[[], T]) -> T:
  """Invoke immediately; binds the name to the function's return value."""
  return func()
