"""Live reward plots for the browser viewer (reference
viewer/viser_reward_plotter.py).

The data side — fixed-length rolling series per reward term — is plain
numpy and unit-testable; the GUI side renders them as viser uplot line
plots and only imports viser lazily.
"""

from __future__ import annotations

import numpy as np


class RewardSeries:
  """Rolling window of per-term reward values."""

  def __init__(self, term_names: list[str], window: int = 200) -> None:
    self.term_names = list(term_names)
    self.window = window
    self._data = {n: np.zeros(window, dtype=np.float32) for n in term_names}
    self._count = 0

  def append(self, values: dict[str, float]) -> None:
    for name in self.term_names:
      buf = self._data[name]
      buf[:-1] = buf[1:]
      buf[-1] = float(values.get(name, 0.0))
    self._count += 1

  def series(self, name: str) -> np.ndarray:
    return self._data[name]

  @property
  def x(self) -> np.ndarray:
    return np.arange(-self.window + 1, 1, dtype=np.float32) + self._count


class ViserRewardPlotter:
  def __init__(self, server, term_names: list[str], window: int = 200,
               plots_per_row: int = 2) -> None:
    self._series = RewardSeries(term_names, window)
    self._plots = {}
    with server.gui.add_folder("Rewards"):
      for name in term_names:
        self._plots[name] = server.gui.add_uplot(
          data=(self._series.x, self._series.series(name)),
          series=({"label": "step"}, {"label": name, "stroke": "#4c72b0"}),
          aspect=2.0,
        )

  def update(self, values: dict[str, float]) -> None:
    self._series.append(values)
    for name, plot in self._plots.items():
      plot.data = (self._series.x, self._series.series(name))

  def clear_histories(self) -> None:
    """Zero all series (env switch / reset — reference clear_histories)."""
    self._series = RewardSeries(self._series.term_names, self._series.window)
    for name, plot in self._plots.items():
      plot.data = (self._series.x, self._series.series(name))

  def cleanup(self) -> None:
    for plot in self._plots.values():
      if hasattr(plot, "remove"):
        plot.remove()
    self._plots.clear()
