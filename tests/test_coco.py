import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

from stmask_tpu.data.coco import COCOAsVideos, COCODataset
from stmask_tpu.utils import rle


@pytest.fixture(scope='module')
def coco_json(tmp_path_factory):
    root = tmp_path_factory.mktemp('coco')
    img_dir = root / 'imgs'
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    h, w = 60, 80
    images, annotations = [], []
    aid = 1
    for img_id in (1, 2):
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f'{img_id}.jpg'), img)
        images.append({'id': img_id, 'file_name': f'{img_id}.jpg',
                       'height': h, 'width': w})
        m = np.zeros((h, w), np.uint8)
        m[10:30, 10:40] = 1
        annotations.append({
            'id': aid, 'image_id': img_id, 'category_id': 7,
            'bbox': [10, 10, 30, 20], 'iscrowd': 0,
            'segmentation': {'size': [h, w],
                             'counts': rle.encode(m)['counts']}})
        aid += 1
    ann_file = root / 'instances.json'
    with open(ann_file, 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': [{'id': 7, 'name': 'cat'}]}, f)
    return str(ann_file), str(img_dir)


def test_coco_dataset_parsing(coco_json):
    ann_file, img_dir = coco_json
    ds = COCODataset(ann_file, img_dir)
    assert ds.image_ids() == [1, 2]
    # sparse category id 7 -> contiguous label 1
    ann = ds.image_annots(1)
    assert ann.labels.tolist() == [1]
    np.testing.assert_allclose(ann.boxes[0], [10, 10, 40, 30])
    assert ann.masks[0].sum() == 20 * 30
    assert ds.train_index() == [1, 2]


def test_coco_as_videos_adapter(coco_json):
    ann_file, img_dir = coco_json
    adapter = COCOAsVideos(COCODataset(ann_file, img_dir))
    assert adapter.video_ids() == [1, 2]
    assert adapter.num_frames(1) == 1
    assert os.path.exists(adapter.frame_path(1, 0))
    gt = adapter.to_ytvis_gt()
    assert len(gt['videos']) == 2
    assert len(gt['annotations']) == 2
    assert all(len(a['segmentations']) == 1 for a in gt['annotations'])

    # perfect 1-frame predictions -> mAP 1.0 through the shared evaluator
    from stmask_tpu.utils.ytvis_eval import evaluate_ytvis
    dt = [{'video_id': a['video_id'], 'score': 0.9,
           'category_id': a['category_id'],
           'segmentations': a['segmentations']}
          for a in gt['annotations']]
    stats = evaluate_ytvis(gt, dt)
    assert stats['mAP'] > 0.99
