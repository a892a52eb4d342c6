"""Host-side postprocessing + YTVIS-format results writer.

Mirrors reference ``layers/output_utils.py:16-133`` (padding undo, mask
upsample + binarize, RLE encode, pixel-space boxes) and
``layers/eval_utils.py:15-106`` (per-frame obj_id results and the grouped
per-video JSON schema the YTVIS server expects).  Only the few kept masks
cross this path; everything heavy stayed on device.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..config import STMaskConfig
from ..utils import rle as rle_util


def _resize_bilinear_np(mask: np.ndarray, out_hw) -> np.ndarray:
    """Bilinear resize matching F.interpolate(align_corners=False)."""
    if cv2 is not None:
        return cv2.resize(mask, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_LINEAR)
    # nearest-equivalent fallback via numpy coordinate sampling
    h, w = mask.shape
    oh, ow = out_hw
    ys = (np.arange(oh) + 0.5) * h / oh - 0.5
    xs = (np.arange(ow) + 0.5) * w / ow - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None]
    wx = np.clip(xs - x0, 0, 1)[None, :]
    return ((mask[np.ix_(y0, x0)] * (1 - wy) * (1 - wx))
            + (mask[np.ix_(y0, x1)] * (1 - wy) * wx)
            + (mask[np.ix_(y1, x0)] * wy * (1 - wx))
            + (mask[np.ix_(y1, x1)] * wy * wx))


def postprocess_frame(cfg: STMaskConfig, frame_out, img_meta: Dict,
                      score_threshold: float = 0.0) -> Dict:
    """FrameOutput (host numpy) -> per-frame results dict keyed by obj_id
    (schema of reference eval_utils.bbox2result_with_id:15-50)."""
    img_h, img_w = img_meta['img_shape'][:2]
    pad_h, pad_w = img_meta.get('pad_shape', (cfg.pad_h, cfg.pad_w))[:2]
    s_h, s_w = img_h / pad_h, img_w / pad_w

    keep = np.asarray(frame_out.keep)
    results = {'video_id': img_meta['video_id'],
               'frame_id': img_meta['frame_id']}
    idxs = np.nonzero(keep)[0]
    if idxs.size == 0:
        return results

    boxes = np.asarray(frame_out.box)
    scores = np.asarray(frame_out.score)
    classes = np.asarray(frame_out.cls)
    masks = np.asarray(frame_out.mask)
    obj_ids = np.asarray(frame_out.obj_id)

    hp, wp = masks.shape[1:]
    crop_h = int(s_h * hp)
    crop_w = int(s_w * wp)
    for i in idxs:
        if score_threshold > 0 and scores[i] <= score_threshold:
            continue
        m = masks[i, :crop_h, :crop_w]
        m = _resize_bilinear_np(m.astype(np.float32), (img_h, img_w))
        m_bin = (m > 0.5).astype(np.uint8)
        segm = rle_util.encode(m_bin)

        b = boxes[i].copy()
        # undo pad normalization -> pixel coords, clamp to image
        x1, x2 = sorted((b[0] * pad_w, b[2] * pad_w))
        y1, y2 = sorted((b[1] * pad_h, b[3] * pad_h))
        bbox = np.asarray([max(0, x1), max(0, y1),
                           min(img_w, x2), min(img_h, y2)], np.float32)

        results[int(obj_ids[i])] = {
            'bbox': bbox,
            'label': int(classes[i]),
            'score': float(scores[i]),
            'segm': segm,
            'category': cfg.classes[int(classes[i]) - 1],
        }
    return results


def results2json_videoseg(results: List[Dict],
                          out_file: Optional[str] = None) -> List[Dict]:
    """Group per-frame results into per-video object tracks
    (reference eval_utils.py:53-106): per-object mean score, majority-vote
    category, per-frame segmentation list with None gaps."""
    json_results = []
    vid_objs: Dict[int, Dict] = {}
    size = len(results)

    for idx in range(size):
        vid_id, frame_id = results[idx]['video_id'], results[idx]['frame_id']
        is_last = (idx == size - 1 or
                   results[idx + 1]['video_id'] != vid_id)

        det = results[idx]
        for obj_id, obj in det.items():
            if obj_id in ('video_id', 'frame_id'):
                continue
            entry = vid_objs.setdefault(
                obj_id, {'scores': [], 'cats': [], 'segms': {}})
            entry['scores'].append(obj['score'])
            entry['cats'].append(obj['label'])
            entry['segms'][frame_id] = obj['segm']
        if is_last:
            for obj_id, obj in vid_objs.items():
                data = {
                    'video_id': vid_id,
                    'score': float(np.mean(obj['scores'])),
                    'category_id': int(np.bincount(
                        np.asarray(obj['cats'])).argmax()),
                    'segmentations': [obj['segms'].get(fid)
                                      for fid in range(frame_id + 1)],
                }
                json_results.append(data)
            vid_objs = {}

    if out_file is not None:
        os.makedirs(os.path.dirname(out_file) or '.', exist_ok=True)
        with open(out_file, 'w') as f:
            json.dump(json_results, f)
    return json_results
