"""Colored terminal output + plain-text tables
(reference utils/logging.py; table rendering replaces prettytable)."""

from __future__ import annotations

import sys

_COLORS = {
  "green": "\033[92m",
  "red": "\033[91m",
  "yellow": "\033[93m",
  "blue": "\033[94m",
  "cyan": "\033[96m",
  "magenta": "\033[95m",
}


def print_info(message: str, color: str = "green") -> None:
  if sys.stdout.isatty() and color in _COLORS:
    print(f"{_COLORS[color]}{message}\033[0m")
  else:
    print(message)


def render_table(title: str, headers: list[str], rows: list[list]) -> str:
  """Minimal ASCII table (the reference uses prettytable for manager
  introspection, e.g. observation_manager.py:48-74)."""
  cells = [[str(c) for c in row] for row in rows]
  widths = [
    max(len(h), *(len(r[i]) for r in cells)) if cells else len(h)
    for i, h in enumerate(headers)
  ]
  sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
  out = [title, sep]
  out.append(
    "|" + "|".join(f" {h:<{w}} " for h, w in zip(headers, widths)) + "|"
  )
  out.append(sep)
  for row in cells:
    out.append(
      "|" + "|".join(f" {c:<{w}} " for c, w in zip(row, widths)) + "|"
    )
  out.append(sep)
  return "\n".join(out)
