"""Cached artifact download with sha256 verification
(reference scripts/gcs.py:18-29). Zero-egress environments can pre-place
files in the cache directory instead."""

from __future__ import annotations

import hashlib
import urllib.request
from pathlib import Path

CACHE_DIR = Path.home() / ".cache" / "mjlab_tpu" / "demo"

DEFAULT_CHECKPOINT_URL = (
  "https://storage.googleapis.com/mjlab-assets/demo/tracking_policy.pt"
)
DEFAULT_MOTION_URL = (
  "https://storage.googleapis.com/mjlab-assets/demo/cartwheel.npz"
)


def _sha256(path: Path) -> str:
  h = hashlib.sha256()
  with open(path, "rb") as f:
    for chunk in iter(lambda: f.read(1 << 20), b""):
      h.update(chunk)
  return h.hexdigest()


def ensure_file(url: str, filename: str, sha256: str | None = None) -> str:
  """Return the cached path, downloading (and verifying) if missing."""
  CACHE_DIR.mkdir(parents=True, exist_ok=True)
  path = CACHE_DIR / filename
  if not path.exists():
    try:
      print(f"Downloading {url} → {path} ...")
      urllib.request.urlretrieve(url, path)
    except Exception as e:
      raise RuntimeError(
        f"Could not download {url}: {e}. Place the file manually at {path}."
      ) from e
  if sha256 is not None and _sha256(path) != sha256:
    path.unlink()
    raise RuntimeError(f"Checksum mismatch for {path}; deleted — retry.")
  return str(path)


def ensure_default_checkpoint() -> str:
  return ensure_file(DEFAULT_CHECKPOINT_URL, "tracking_policy.pt")


def ensure_default_motion() -> str:
  return ensure_file(DEFAULT_MOTION_URL, "cartwheel.npz")
