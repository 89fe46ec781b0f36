"""Asset resolution.

The reference bakes absolute asset paths at CMake configure time
(ressources.h.in, CMakeLists.txt:9-10).  Here assets resolve at runtime:
``ARTPU_ASSETS`` env var, else the conventional reference checkout location,
else None — and every consumer degrades gracefully (cyan texture for missing
images, matching texture.h:91-92; procedural geometry for missing meshes).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

_CANDIDATES = (
    os.environ.get("ARTPU_ASSETS"),
    "/root/reference",
)


def asset_root() -> Optional[Path]:
    for c in _CANDIDATES:
        if c and Path(c).is_dir():
            return Path(c)
    return None


def find(relpath: str) -> Optional[Path]:
    """Resolve e.g. 'textures/earthmap.jpg' or 'models/capsule/capsule.obj'."""
    root = asset_root()
    if root is None:
        return None
    p = root / relpath
    return p if p.exists() else None


def earthmap_path() -> Optional[Path]:
    return find("textures/earthmap.jpg")


def capsule_obj_path() -> Optional[Path]:
    return find("models/capsule/capsule.obj")


def cow_obj_path() -> Optional[Path]:
    return find("models/cow.obj")


def dino_obj_path() -> Optional[Path]:
    return find("models/dino.obj")
