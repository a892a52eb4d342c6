"""Data pipeline end-to-end: synthetic YTVIS JSON + JPEGs -> padded batches."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from stmask_tpu.config import get_config
from stmask_tpu.data import ClipLoader, YTVISDataset
from stmask_tpu.data.transforms import pad_gt, preprocess_frame
from stmask_tpu.utils import rle

CFG = get_config('STMask_plus_resnet50').replace(max_gt_per_frame=8)


@pytest.fixture(scope='module')
def synth_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp('ytvis')
    img_dir = root / 'imgs'
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    videos, annotations = [], []
    h, w = 180, 320
    n_videos, n_frames = 3, 5
    aid = 1
    for vid in range(1, n_videos + 1):
        names = []
        for f in range(n_frames):
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            name = f'v{vid:02d}/f{f:02d}.jpg'
            os.makedirs(img_dir / f'v{vid:02d}', exist_ok=True)
            cv2.imwrite(str(img_dir / name), img)
            names.append(name)
        videos.append({'id': vid, 'file_names': names, 'height': h,
                       'width': w})
        # two moving objects per video
        for obj in range(2):
            segs, bboxes = [], []
            for f in range(n_frames):
                x0 = 20 + 10 * f + 80 * obj
                y0 = 30 + 5 * f + 40 * obj
                m = np.zeros((h, w), np.uint8)
                m[y0:y0 + 50, x0:x0 + 60] = 1
                enc = rle.encode(m)
                segs.append(enc)
                bboxes.append([x0, y0, 60, 50])
            annotations.append({
                'id': aid, 'video_id': vid, 'category_id': obj + 1,
                'segmentations': segs, 'bboxes': bboxes,
            })
            aid += 1
    ann = {'videos': videos, 'annotations': annotations,
           'categories': [{'id': i + 1, 'name': c}
                          for i, c in enumerate(CFG.classes)]}
    ann_file = root / 'train.json'
    with open(ann_file, 'w') as f:
        json.dump(ann, f)
    return str(ann_file), str(img_dir)


def test_dataset_parsing(synth_dataset):
    ann_file, img_prefix = synth_dataset
    ds = YTVISDataset(ann_file, img_prefix)
    assert len(ds.video_ids()) == 3
    assert ds.num_frames(1) == 5
    ann = ds.frame_annots(1, 2)
    assert ann.boxes.shape == (2, 4)
    assert ann.masks.shape[0] == 2
    assert ann.masks[0].sum() == 50 * 60
    # box matches mask extent
    np.testing.assert_allclose(ann.boxes[0], [40, 40, 100, 90])


def test_train_index_and_ref_sampling(synth_dataset):
    ann_file, img_prefix = synth_dataset
    ds = YTVISDataset(ann_file, img_prefix)
    idx = ds.train_index()
    assert len(idx) == 15     # every frame annotated
    rng = np.random.RandomState(0)
    for _ in range(20):
        ref = ds.sample_ref_frame(1, 2, rng)
        assert ref != 2 and 0 <= ref <= 4


def test_preprocess_frame_geometry(synth_dataset):
    ann_file, img_prefix = synth_dataset
    ds = YTVISDataset(ann_file, img_prefix)
    from stmask_tpu.data import load_image_rgb
    img = load_image_rgb(ds.frame_path(1, 0))
    annots = ds.frame_annots(1, 0)
    out = preprocess_frame(CFG, img, annots, flip=False)
    assert out['image'].shape == (CFG.pad_h, CFG.pad_w, 3)
    # boxes normalized by pad shape; original box x0=20/320 of img width
    b = out['boxes'][0]
    assert 0 <= b[0] < b[2] <= 1 and 0 <= b[1] < b[3] <= 1
    x_pix = b[0] * CFG.pad_w
    np.testing.assert_allclose(x_pix, 20 / 320 * CFG.img_w, atol=1.0)
    # proto-res mask aligns with the box
    mp = out['masks_proto'][0]
    ys, xs = np.nonzero(mp)
    np.testing.assert_allclose(xs.min() / (CFG.pad_w // 4), b[0], atol=0.03)


def test_clip_loader_batches(synth_dataset):
    ann_file, img_prefix = synth_dataset
    ds = YTVISDataset(ann_file, img_prefix)
    loader = ClipLoader(CFG, ds, batch_size=2, num_workers=2)
    batch = next(iter(loader.epoch(0)))
    g = CFG.max_gt_per_frame
    assert batch['images'].shape == (2, 2, CFG.pad_h, CFG.pad_w, 3)
    assert batch['boxes'].shape == (2, 2, g, 4)
    assert batch['masks_proto'].shape == (2, 2, g, CFG.pad_h // 4,
                                          CFG.pad_w // 4)
    assert batch['valid'].sum() == 2 * 2 * 2   # 2 objects per frame
    # ids globally unique across clips
    ids = batch['ids'][batch['valid']]
    v0 = batch['ids'][0][batch['valid'][0]]
    v1 = batch['ids'][1][batch['valid'][1]]
    assert set(v0.tolist()).isdisjoint(set(v1.tolist()))
    # same object keeps its id across the two frames of a clip
    assert set(batch['ids'][0, 0][batch['valid'][0, 0]].tolist()) == \
        set(batch['ids'][0, 1][batch['valid'][0, 1]].tolist())


@pytest.mark.parametrize('mode', ['extra', 'ssd'])
def test_clip_loader_with_train_augment(synth_dataset, mode):
    """cfg.train_augment wires the aug chain ahead of the fixed resize;
    batches keep static shapes and box/mask consistency."""
    ann_file, img_prefix = synth_dataset
    ds = YTVISDataset(ann_file, img_prefix)
    cfg = CFG.replace(train_augment=mode)
    loader = ClipLoader(cfg, ds, batch_size=2, num_workers=2)
    batch = next(iter(loader.epoch(0)))
    g = cfg.max_gt_per_frame
    assert batch['images'].shape == (2, 2, cfg.pad_h, cfg.pad_w, 3)
    assert batch['boxes'].shape == (2, 2, g, 4)
    assert batch['valid'].sum() >= 4           # crops may drop an object
    val = batch['valid']
    assert np.all(batch['boxes'][val] >= -1e-6)
    assert np.all(batch['boxes'][val] <= 1 + 1e-6)
    # each surviving mask stays inside its (normalized, pad-scaled) box
    hp, wp = cfg.pad_h // 4, cfg.pad_w // 4
    for b, m in zip(batch['boxes'][val], batch['masks_proto'][val]):
        ys, xs = np.nonzero(m)
        if xs.size:
            assert xs.min() / wp >= b[0] - 0.1
            assert xs.max() / wp <= b[2] + 0.1
            assert ys.min() / hp >= b[1] - 0.1
            assert ys.max() / hp <= b[3] + 0.1


def test_u8_loader_matches_fp32_path(synth_dataset):
    """uint8-upload training path (image_u8=True + device
    train_base_transform) matches the host fp32 path to fp32 rounding
    (XLA folds /std into a reciprocal multiply) for unaugmented uint8
    sources, with identical targets."""
    import jax.numpy as jnp
    from stmask_tpu.data.transforms import (train_base_transform,
                                            unpack_masks_device)
    ann_file, img_prefix = synth_dataset
    ds = YTVISDataset(ann_file, img_prefix)
    lf = ClipLoader(CFG, ds, batch_size=2, num_workers=2)
    lu = ClipLoader(CFG, ds, batch_size=2, num_workers=2, image_u8=True)
    bf = next(iter(lf.epoch(0)))
    bu = next(iter(lu.epoch(0)))
    assert bu['images'].dtype == np.uint8
    assert bu['images'].shape == (2, 2, CFG.img_h, CFG.img_w, 3)
    prep = train_base_transform(CFG)
    images = np.asarray(prep(jnp.asarray(bu['images'])))
    np.testing.assert_allclose(images, bf['images'], atol=1e-5)
    # masks ship bit-packed (8x fewer bytes); device unpack restores them
    wp = CFG.pad_w // 4
    assert bu['masks_proto'].shape[-1] == int(np.ceil(wp / 8))
    unpacked = np.asarray(unpack_masks_device()(
        jnp.asarray(bu['masks_proto'])))[..., :wp]
    np.testing.assert_array_equal(unpacked, bf['masks_proto'])
    for k in ('boxes', 'labels', 'ids', 'valid'):
        np.testing.assert_array_equal(bu[k], bf[k])


def test_u8_loader_augmented_quantization(synth_dataset):
    """With augmentation on, the u8 path rounds float frames to uint8:
    values stay in range and the quantization is <= 0.5/std after the
    device normalize (documented deviation)."""
    ann_file, img_prefix = synth_dataset
    ds = YTVISDataset(ann_file, img_prefix)
    cfg = CFG.replace(train_augment='extra')
    loader = ClipLoader(cfg, ds, batch_size=2, num_workers=2,
                        image_u8=True)
    batch = next(iter(loader.epoch(0)))
    assert batch['images'].dtype == np.uint8
    assert batch['images'].shape == (2, 2, cfg.img_h, cfg.img_w, 3)


def test_prefetcher_propagates_put_errors():
    """A device/transfer error inside put_fn must fail the consuming loop,
    not silently end the epoch (the worker used to swallow it and emit a
    clean end-of-iteration)."""
    from stmask_tpu.data.loader import Prefetcher

    def boom(x):
        raise RuntimeError('device exploded')

    pf = Prefetcher(iter([1, 2]), put_fn=boom)
    with pytest.raises(RuntimeError, match='device exploded'):
        list(pf)


def test_prefetcher_normal_epoch_end():
    from stmask_tpu.data.loader import Prefetcher
    assert list(Prefetcher(iter([1, 2, 3]), put_fn=lambda x: x * 10)) == \
        [10, 20, 30]
