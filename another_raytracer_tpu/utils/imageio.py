"""Host-side image IO.

The reference vendors stb_image / stb_image_write for JPEG/PNG decode/encode
(SURVEY §2.7) — cold-path host work.  Here decode feeds texture atlases at
scene-build time and encode writes the final gathered framebuffer; the device
never touches an image codec.
"""

from __future__ import annotations

import numpy as np


def load_image(path) -> "np.ndarray | None":
    """Decode an image file to [h, w, 3] float64 in [0,1]; None on failure
    (callers degrade to the cyan fallback texture, texture.h:91-92).

    The cyan fallback is the reference's contract for *missing* files only
    (texture.h:91-92); its stb_image always decodes files that exist.  When a
    present-on-disk file cannot be decoded here (no PIL, corrupt data), that
    is a capability gap, not expected degradation — warn loudly instead of
    silently rendering cyan.
    """
    import os
    import warnings

    exists = os.path.exists(path)
    try:
        from PIL import Image
    except ImportError:
        if exists:
            warnings.warn(
                f"image file {path!r} exists but PIL is unavailable; "
                "falling back to the solid-cyan texture (the reference "
                "would have decoded this file)",
                RuntimeWarning, stacklevel=2,
            )
        return None
    try:
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), np.float64) / 255.0
    except Exception as e:
        if exists:
            warnings.warn(
                f"image file {path!r} exists but failed to decode ({e}); "
                "falling back to the solid-cyan texture",
                RuntimeWarning, stacklevel=2,
            )
        return None


def _encode_png(img: "np.ndarray") -> bytes:
    """Minimal stdlib PNG encoder (8-bit RGB, zlib-deflated, no filtering).

    Keeps PNG output self-contained like the reference's vendored
    stb_image_write (SURVEY §2.7) — PIL is preferred for speed but never
    required.
    """
    import struct
    import zlib

    h, w = img.shape[:2]
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def save_png(path, image_uint8) -> None:
    """Encode a [h, w, 3] uint8 array as PNG (reference: output.png,
    main.cpp:57).  Uses PIL when available, else the stdlib encoder."""
    img = np.ascontiguousarray(np.asarray(image_uint8, np.uint8))
    try:
        from PIL import Image

        Image.fromarray(img, "RGB").save(path)
    except ImportError:
        with open(path, "wb") as f:
            f.write(_encode_png(img))


def save_ppm(path, image_uint8) -> None:
    """Plain PPM writer (no dependencies), for debugging."""
    img = np.asarray(image_uint8, np.uint8)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img.tobytes())
