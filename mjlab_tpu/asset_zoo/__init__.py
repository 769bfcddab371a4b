"""Asset zoo: robot models and their actuation/collision configs.

Robot MJCF here is physics-only (no visual meshes) — derived and
parity-verified by tools/extract_robot_mjcf.py against the upstream
menagerie-style descriptions the reference vendors
(reference asset_zoo/robots/*/xmls/*.xml).
"""

from pathlib import Path

ASSET_ZOO_PATH = Path(__file__).resolve().parent


def load_asset_dir(xml_path: Path) -> dict[str, bytes]:
  """Collect binary assets (collision meshes) living next to a robot XML.

  Keys are registered both bare and meshdir-prefixed so MjSpec resolves
  them regardless of the model's compiler meshdir setting (reference
  utils/os.py:8-34 update_assets).
  """
  assets: dict[str, bytes] = {}
  asset_dir = xml_path.parent / "assets"
  if asset_dir.is_dir():
    for f in sorted(asset_dir.iterdir()):
      data = f.read_bytes()
      assets[f.name] = data
      assets[f"assets/{f.name}"] = data
  return assets
