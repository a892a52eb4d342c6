"""Debug / display visualizations (host-side, cv2).

Equivalent of reference ``layers/visualization.py`` and the display helpers
in ``layers/output_utils.py:136-244``: detection overlays (box + mask +
class/score/id), prototype grids, correlation-patch maps, box-shift
overlays, and the image un-normalization for display.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..config import MEANS, STD, STMaskConfig

# box display palette (reference datasets/config.py COLORS)
COLORS = ((244, 67, 54), (233, 30, 99), (156, 39, 176), (103, 58, 183),
          (63, 81, 181), (33, 150, 243), (3, 169, 244), (0, 188, 212),
          (0, 150, 136), (76, 175, 80), (139, 195, 74), (205, 220, 57),
          (255, 235, 59), (255, 193, 7), (255, 152, 0), (255, 87, 34),
          (121, 85, 72), (158, 158, 158), (96, 125, 139))


def undo_image_transformation(img: np.ndarray, img_h: int,
                              img_w: int) -> np.ndarray:
    """Normalized padded NHWC float image -> uint8 RGB at image size
    (reference output_utils.py:136-165)."""
    img = img[:img_h, :img_w]
    img = img * np.asarray(STD, np.float32) + np.asarray(MEANS, np.float32)
    return np.clip(img, 0, 255).astype(np.uint8)


def draw_detections(img_rgb: np.ndarray, boxes: np.ndarray,
                    classes: np.ndarray, scores: np.ndarray,
                    masks: Optional[np.ndarray] = None,
                    obj_ids: Optional[np.ndarray] = None,
                    class_names: Optional[Sequence[str]] = None,
                    mask_alpha: float = 0.45) -> np.ndarray:
    """Overlay boxes/masks/labels; boxes in pixel xyxy, masks [n, H, W]."""
    out = img_rgb.copy()
    for i in range(len(boxes)):
        color = COLORS[(int(obj_ids[i]) if obj_ids is not None else i)
                       % len(COLORS)]
        x1, y1, x2, y2 = [int(v) for v in boxes[i]]
        if masks is not None:
            m = masks[i].astype(bool)
            out[m] = (out[m] * (1 - mask_alpha)
                      + np.asarray(color) * mask_alpha).astype(np.uint8)
        cv2.rectangle(out, (x1, y1), (x2, y2), color, 2)
        name = (class_names[int(classes[i]) - 1] if class_names
                else str(int(classes[i])))
        label = f'{name}: {scores[i]:.2f}'
        if obj_ids is not None:
            label = f'#{int(obj_ids[i])} ' + label
        cv2.putText(out, label, (x1, max(12, y1 - 4)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.45, color, 1)
    return out


def proto_grid(proto: np.ndarray, cols: int = 8) -> np.ndarray:
    """[H, W, K] prototypes -> one tiled grayscale grid image
    (reference display_protos/display_lincomb spirit)."""
    h, w, k = proto.shape
    rows = (k + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w), np.float32)
    for i in range(k):
        r, c = divmod(i, cols)
        p = proto[..., i]
        rng = p.max() - p.min()
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = \
            (p - p.min()) / (rng if rng > 0 else 1)
    return (grid * 255).astype(np.uint8)


def correlation_patch_map(corr: np.ndarray, y: int, x: int,
                          patch_size: int = 11) -> np.ndarray:
    """[H, W, patch^2] cost volume -> the displacement heatmap at (y, x)
    (reference display_correlation_map_patch)."""
    m = corr[y, x].reshape(patch_size, patch_size)
    rng = m.max() - m.min()
    m = (m - m.min()) / (rng if rng > 0 else 1)
    return (m * 255).astype(np.uint8)


def draw_box_shift(img_rgb: np.ndarray, box_ref: np.ndarray,
                   box_shift: np.ndarray) -> np.ndarray:
    """Reference-frame box (blue) vs shifted box (green)
    (reference display_box_shift)."""
    out = img_rgb.copy()
    for b, col in ((box_ref, (33, 150, 243)), (box_shift, (76, 175, 80))):
        for i in range(len(b)):
            x1, y1, x2, y2 = [int(v) for v in b[i]]
            cv2.rectangle(out, (x1, y1), (x2, y2), col, 2)
    return out
