"""Training clip loader: threaded decode + padded collate + prefetch.

Replaces the reference DataLoader/collate stack (``datasets/__init__.py:21``
detection_collate, ``datasets/utils.py:126`` prepare_data,
``datasets/loader/sampler.py`` Distributed/GroupSampler): per-host index
sharding with epoch-seeded determinism, a thread pool for JPEG decode +
resize (cv2 releases the GIL), static-shape padded batches, and
double-buffered prefetch so the host pipeline overlaps device steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from ..config import STMaskConfig
from .transforms import pad_gt, preprocess_frame
from .ytvis import YTVISDataset


def load_image_rgb(path: str) -> np.ndarray:
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def shard_indices(index: Sequence, epoch: int, num_shards: int = 1,
                  shard_id: int = 0, shuffle: bool = True) -> List:
    """Epoch-seeded deterministic shuffle + per-host sharding (the semantics
    of reference DistributedGroupSampler, sampler.py:98-132)."""
    order = np.arange(len(index))
    if shuffle:
        np.random.RandomState(epoch).shuffle(order)
    per = (len(order) + num_shards - 1) // num_shards
    # pad cyclically so every shard sees the same count
    padded = np.concatenate([order, order[:per * num_shards - len(order)]])
    mine = padded[shard_id * per:(shard_id + 1) * per]
    return [index[i] for i in mine]


class ClipLoader:
    """Yields padded two-frame-clip batches for training."""

    def __init__(self, cfg: STMaskConfig, dataset: YTVISDataset,
                 batch_size: int, seed: int = 0, num_workers: int = 8,
                 num_shards: int = 1, shard_id: int = 0,
                 image_u8: bool = False):
        self.cfg = cfg
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.num_workers = num_workers
        self.num_shards = num_shards
        self.shard_id = shard_id
        # image_u8: emit uint8 [img_h, img_w, 3] frames; normalize + pad
        # on device (transforms.train_base_transform) — 4x less upload
        self.image_u8 = image_u8
        self.index = dataset.train_index()
        if cfg.train_augment == 'extra':
            from .augment import ExtraAugmentation
            self.augment = ExtraAugmentation(photo_metric_distortion={},
                                             expand={}, random_crop={})
        elif cfg.train_augment == 'ssd':
            from .augment import SSDAugmentation
            self.augment = SSDAugmentation()
        else:
            self.augment = None

    def _load_clip(self, vid: int, key_frame: int,
                   rng: np.random.RandomState) -> Dict:
        ref_frame = self.ds.sample_ref_frame(vid, key_frame, rng,
                                             self.cfg_clip_frames())
        flip = rng.rand() < 0.5
        frames = []
        for f in (key_frame, ref_frame):
            img = load_image_rgb(self.ds.frame_path(vid, f))
            annots = self.ds.frame_annots(vid, f)
            if self.augment is not None and len(annots.boxes):
                # geometric+photometric aug at original resolution; crowd
                # regions are approximate neutral zones and ride through
                # un-augmented (crops may invalidate them — acceptable, the
                # reference extra_aug path doesn't augment crowds either)
                img, boxes, labels, masks, ids = self.augment(
                    img, annots.boxes, annots.labels, annots.masks,
                    annots.ids, rng=rng)
                annots = type(annots)(
                    boxes.astype(np.float32), labels, ids,
                    masks.astype(np.uint8),
                    crowd_boxes=np.zeros((0, 4), np.float32))
            frames.append(pad_gt(self.cfg,
                                 preprocess_frame(self.cfg, img, annots,
                                                  flip=flip,
                                                  image_u8=self.image_u8)))
        return {k: np.stack([fr[k] for fr in frames])
                for k in frames[0]}

    def cfg_clip_frames(self) -> int:
        return 1

    def epoch(self, epoch: int) -> Iterator[Dict]:
        """Iterate one epoch of batches."""
        idx = shard_indices(self.index, epoch + self.seed,
                            self.num_shards, self.shard_id)
        rng = np.random.RandomState(epoch * 7919 + self.seed)

        from concurrent.futures import ThreadPoolExecutor
        bs = self.batch_size
        with ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(idx) - bs + 1, bs):
                chunk = idx[start:start + bs]
                seeds = [np.random.RandomState(rng.randint(2 ** 31))
                         for _ in chunk]
                clips = list(pool.map(
                    lambda a: self._load_clip(a[0][0], a[0][1], a[1]),
                    zip(chunk, seeds)))
                batch = {k: np.stack([c[k] for c in clips])
                         for k in clips[0]}
                batch['images'] = batch.pop('image')
                # globally-unique instance ids within the batch: offset by
                # clip index so the cross-clip contrastive loss never
                # collides ids from different videos
                ids = batch['ids']
                offset = (np.arange(ids.shape[0], dtype=np.int32)
                          * 100000)[:, None, None]
                batch['ids'] = np.where(ids > 0, ids % 100000 + offset + 1,
                                        0).astype(np.int32)
                if self.image_u8:
                    # bit-pack the binary gt masks (8x fewer bytes over
                    # the host->device link); unpacked on device by
                    # transforms.unpack_masks_device
                    batch['masks_proto'] = np.packbits(
                        batch['masks_proto'], axis=-1)
                yield batch


class Prefetcher:
    """Double-buffered background prefetch onto device."""

    def __init__(self, it: Iterator, put_fn: Optional[Callable] = None,
                 depth: int = 2):
        self.q: 'queue.Queue' = queue.Queue(maxsize=depth)
        self.put_fn = put_fn or (lambda x: x)
        self._done = object()

        def worker():
            try:
                for item in it:
                    self.q.put(self.put_fn(item))
            except BaseException as e:  # noqa: B036 — re-raised in consumer
                import sys
                if isinstance(e, RuntimeError) and sys.is_finalizing():
                    pass  # benign interpreter-shutdown race
                else:
                    # propagate to the consumer: a device/transfer error in
                    # put_fn must fail the training loop, not silently end
                    # the epoch
                    self.q.put(_PrefetchError(e))
            finally:
                self.q.put(self._done)

        self.t = threading.Thread(target=worker, daemon=True)
        self.t.start()

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is self._done:
                return
            if isinstance(item, _PrefetchError):
                raise item.exc
            yield item


class _PrefetchError:
    """Wrapper carrying a prefetch-worker exception to the consumer."""

    def __init__(self, exc: BaseException):
        self.exc = exc
