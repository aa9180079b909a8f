"""Image file IO (PNG/JPEG via PIL + raw float dumps).

Replaces the reference's stb_image load path (Texture.cpp:166-298) and the
screenshot/present output (we are headless: frames are written to disk,
SURVEY.md §7 "ImGui app → headless CLI").
"""

from __future__ import annotations

import numpy as np


def load_image_rgba8(path: str) -> np.ndarray:
    """Load png/jpg as (H, W, 4) uint8 (like stb with STBI_rgb_alpha)."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGBA")
        return np.asarray(im, dtype=np.uint8)


def write_png(path: str, img: np.ndarray) -> None:
    """Write (H, W, 3|4) uint8 or float in [0,1] to PNG."""
    from PIL import Image

    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
        img = (img * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(img).save(path)


def write_npy(path: str, img: np.ndarray) -> None:
    """Raw float dump for goldens/debug (TextureDebug-equivalent)."""
    np.save(path, np.asarray(img))
