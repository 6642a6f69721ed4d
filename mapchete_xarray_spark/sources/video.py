"""Deterministic synthetic MJPEG-AVI clips (the video twin of
``sources/audio.py``): every payload is derived from its integer index
alone, so the engine's distributed synth and a driver-side serial
oracle reconstruct byte-identical containers.

Each clip: ``_N_FRAMES`` 48×64 frames — a two-axis gradient whose
phase, a moving square whose color/track, and the frame rate all vary
with the index — encoded frame-by-frame with ``jpeg.encode`` (4:4:4,
fixed quality: bit-deterministic) and wrapped by ``avi.encode``.
"""

from __future__ import annotations

import numpy as np

from .. import avi, jpeg

__all__ = ["video_params", "video_frames_rgb", "video_avi", "N_FRAMES"]

N_FRAMES = 6
_W, _H = 64, 48
_QUALITY = 90


def video_params(i: int) -> tuple[float, tuple[int, int, int]]:
    """(fps, square RGB color) for clip ``i`` — plain integer math."""
    fps = float(8 + (i * 7) % 5)  # 8..12 fps
    color = (
        (i * 37) % 256,
        (i * 101 + 64) % 256,
        (i * 59 + 128) % 256,
    )
    return fps, color


def video_frames_rgb(i: int) -> list[np.ndarray]:
    """The clip's raw frames, pre-encode (deterministic)."""
    _, color = video_params(i)
    px = (i * 13) % 40
    py = (i * 29) % 24
    out = []
    for f in range(N_FRAMES):
        img = np.zeros((_H, _W, 3), dtype=np.uint8)
        img[:, :, 0] = np.roll(
            np.linspace(0, 255, _W, dtype=np.uint8), (i + f) % _W
        )[None, :]
        img[:, :, 2] = np.linspace(255, 0, _H, dtype=np.uint8)[:, None]
        x = (px + f * 4) % (_W - 12)
        y = (py + f * 2) % (_H - 12)
        img[y : y + 12, x : x + 12] = color
        out.append(img)
    return out


def video_avi(i: int) -> bytes:
    """The committed-format payload: MJPEG frames in an AVI container."""
    fps, _ = video_params(i)
    payloads = [
        jpeg.encode(f, quality=_QUALITY) for f in video_frames_rgb(i)
    ]
    return avi.encode(payloads, _W, _H, fps=fps)
