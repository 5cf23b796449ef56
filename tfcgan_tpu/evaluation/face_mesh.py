"""Face-landmark overlays for qualitative registration checks.

Rebuilds ``TFC-STN/google_face_mesh.py:16-75`` + ``TFC-STN/mesh.py:12-28``:
the reference runs MediaPipe FaceMesh over the cropped ``real_A / reg_B /
real_B`` dirs and writes landmark-tessellation overlays next to them, to
eyeball how well the STN registered the thermal image.

MediaPipe is an optional dependency (not installable in every environment),
so this module splits the utility in two:

- a dependency-free drawing core (``draw_landmarks``) that overlays any
  (x, y) landmark set + connection list onto a numpy image via PIL, and
- a gated MediaPipe backend (``detect_landmarks_mediapipe``) used when the
  package is importable, matching the reference's FaceMesh settings
  (static_image_mode, refine_landmarks=True, max_num_faces=1,
  min_detection_confidence=0.3).

``overlay_directory`` mirrors ``mesh.py``'s iterate-and-annotate driver.
"""

from __future__ import annotations

import os
from typing import Iterable, Sequence

import numpy as np


def _require_mediapipe():
    try:
        import mediapipe as mp  # type: ignore
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "face-mesh landmark *detection* needs the optional 'mediapipe' "
            "package (the drawing core in this module works without it — "
            "pass your own landmarks to draw_landmarks)."
        ) from e
    return mp


def detect_landmarks_mediapipe(image: np.ndarray):
    """Run MediaPipe FaceMesh with the reference's settings.

    image: (H, W, 3) uint8 RGB. Returns ((N, 2) float pixel coords,
    connection index pairs) or None when no face is found (the reference
    prints "NONE!" and skips, ``google_face_mesh.py:72-74``).
    """
    mp = _require_mediapipe()
    fm = mp.solutions.face_mesh
    with fm.FaceMesh(
        static_image_mode=True, refine_landmarks=True, max_num_faces=1,
        min_detection_confidence=0.3,
    ) as mesh:
        results = mesh.process(image)
    if not results.multi_face_landmarks:
        return None
    h, w = image.shape[:2]
    lm = results.multi_face_landmarks[0].landmark
    pts = np.array([[p.x * w, p.y * h] for p in lm], np.float32)
    return pts, list(fm.FACEMESH_TESSELATION)


def draw_landmarks(
    image: np.ndarray,
    points: np.ndarray,
    connections: Iterable[Sequence[int]] = (),
    point_color=(0, 255, 0),
    line_color=(192, 192, 192),
    radius: int = 1,
) -> np.ndarray:
    """Dependency-free overlay: connections as 1-px lines, landmarks as dots.

    image: (H, W, 3) uint8; points: (N, 2) pixel coords. Returns a copy.
    """
    from PIL import Image, ImageDraw

    img = Image.fromarray(image.copy())
    draw = ImageDraw.Draw(img)
    pts = np.asarray(points, np.float32)
    for a, b in connections:
        if a < len(pts) and b < len(pts):
            draw.line([tuple(pts[a]), tuple(pts[b])], fill=tuple(line_color))
    for x, y in pts:
        draw.ellipse([x - radius, y - radius, x + radius, y + radius],
                     fill=tuple(point_color))
    return np.asarray(img)


def overlay_image(img_path: str, save_dir: str, detector=None) -> bool:
    """Annotate one image (``google_face_mesh.py draw_face``); returns
    whether a face was found. ``detector`` defaults to MediaPipe; pass any
    callable image -> (points, connections) | None to swap backends."""
    from PIL import Image

    detector = detector or detect_landmarks_mediapipe
    image = np.asarray(Image.open(img_path).convert("RGB"))
    det = detector(image)
    if det is None:
        return False
    out = draw_landmarks(image, det[0], det[1])
    os.makedirs(save_dir, exist_ok=True)
    Image.fromarray(out).save(os.path.join(save_dir, os.path.basename(img_path)))
    return True


def overlay_directory(src_dir: str, save_dir: str, detector=None) -> int:
    """``mesh.py iterate_dir``: annotate every image in src_dir; returns the
    number of faces found. Detection failures are skipped, not raised."""
    n = 0
    for f in sorted(os.listdir(src_dir)):
        if f.startswith("."):
            continue
        try:
            n += bool(overlay_image(os.path.join(src_dir, f), save_dir, detector))
        except (OSError, ValueError):
            continue
    return n
