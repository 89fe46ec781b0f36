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
    (callers degrade to the cyan fallback texture, texture.h:91-92)."""
    try:
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"), np.float64) / 255.0
        return arr
    except Exception:
        return None


def save_png(path, image_uint8) -> None:
    """Encode a [h, w, 3] uint8 array as PNG (reference: output.png,
    main.cpp:57)."""
    from PIL import Image

    Image.fromarray(np.asarray(image_uint8, np.uint8), "RGB").save(path)


def save_ppm(path, image_uint8) -> None:
    """Plain PPM writer (no dependencies), for debugging."""
    img = np.asarray(image_uint8, np.uint8)
    h, w = img.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(img.tobytes())
