from .loader import ClipLoader, Prefetcher, load_image_rgb, shard_indices
from .transforms import normalize_image, pad_gt, preprocess_frame
from .ytvis import FrameAnnots, YTVISDataset

__all__ = ['ClipLoader', 'Prefetcher', 'load_image_rgb', 'shard_indices',
           'normalize_image', 'pad_gt', 'preprocess_frame', 'FrameAnnots',
           'YTVISDataset']
