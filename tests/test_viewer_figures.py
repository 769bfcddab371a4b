"""Native-viewer reward-figure data path (viewer-independent)."""

import numpy as np

from mjlab_tpu.viewer.native import RewardFigures


def test_rolling_history_and_autoscale():
  rf = RewardFigures(["alive", "slip"], history=50)
  for i in range(60):
    rf.append({"alive": i * 0.1, "slip": -i * 0.05})
  fig = rf.figures["alive"]
  assert fig.linepnt[0] == 50
  # Newest point first at x=0 with the latest value.
  np.testing.assert_allclose(fig.linedata[0][0], 0.0)
  np.testing.assert_allclose(fig.linedata[0][1], 5.9, rtol=1e-6)
  # Autoscale brackets the visible window ([1.0, 5.9] ± padding).
  assert fig.range[1][0] < 1.5 and fig.range[1][1] > 5.5


def test_nonfinite_values_skipped():
  rf = RewardFigures(["r"], history=10)
  rf.append({"r": 1.0})
  rf.append({"r": float("nan")})
  rf.append({"r": 2.0})
  assert rf.figures["r"].linepnt[0] == 2


def test_viewport_layout_fits_window():
  rf = RewardFigures([f"t{i}" for i in range(8)], history=10)
  pairs = rf.viewport_figures(1280, 720)
  assert 0 < len(pairs) <= 8
  for vp, _ in pairs:
    assert 0 <= vp.left and vp.left + vp.width <= 1280
    assert 0 <= vp.bottom and vp.bottom + vp.height <= 720


def test_max_panels_cap():
  rf = RewardFigures([f"t{i}" for i in range(30)], max_panels=12)
  assert len(rf.term_names) == 12
