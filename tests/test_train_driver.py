"""train.py CLI end-to-end: a few steps on a synthetic dataset + resume."""

import json
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip('cv2')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stmask_tpu.utils import rle


@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp('drv')
    img_dir = root / 'imgs'
    rng = np.random.RandomState(0)
    h, w = 96, 128
    videos, annotations = [], []
    aid = 1
    for vid in (1, 2):
        names = []
        os.makedirs(img_dir / f'v{vid}', exist_ok=True)
        segs, bboxes = [], []
        for f in range(4):
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            x0 = 10 + 5 * f
            img[20:60, x0:x0 + 40] = (250, 40, 40)
            name = f'v{vid}/f{f}.jpg'
            cv2.imwrite(str(img_dir / name), img)
            names.append(name)
            m = np.zeros((h, w), np.uint8)
            m[20:60, x0:x0 + 40] = 1
            segs.append(rle.encode(m))
            bboxes.append([x0, 20, 40, 40])
        videos.append({'id': vid, 'file_names': names, 'height': h,
                       'width': w})
        annotations.append({'id': aid, 'video_id': vid, 'category_id': 1,
                            'segmentations': segs, 'bboxes': bboxes})
        aid += 1
    ann_file = root / 'train.json'
    with open(ann_file, 'w') as f:
        json.dump({'videos': videos, 'annotations': annotations,
                   'categories': [{'id': 1, 'name': 'a'}]}, f)
    return str(ann_file), str(img_dir), str(root)


@pytest.mark.slow
def test_train_cli_runs_and_resumes(synth):
    ann_file, img_prefix, root = synth
    import train as train_mod
    save = os.path.join(root, 'weights')
    log = os.path.join(root, 'logs')
    common = ['--config', 'STMask_plus_resnet50', '--batch_size', '2',
              '--ann_file', ann_file, '--img_prefix', img_prefix,
              '--save_folder', save, '--log_folder', log,
              '--img_w', '128', '--img_h', '96',
              '--max_iter', '2', '--no_autoscale', '--save_interval', '2',
              '--num_workers', '2']
    assert train_mod.main(common) == 0
    ckpts = os.listdir(save)
    assert any('STMask_plus_resnet50' in c for c in ckpts)
    logf = os.path.join(log, 'STMask_plus_resnet50.log')
    entries = [json.loads(l) for l in open(logf)]
    assert any(e['type'] == 'train' for e in entries)

    # resume from latest and run to iteration 3
    args2 = list(common)
    args2[args2.index('--max_iter') + 1] = '3'
    assert train_mod.main(args2 + ['--resume', 'latest']) == 0


@pytest.mark.slow
def test_delayed_settings_apply_mid_epoch(synth, monkeypatch, capsys):
    """cfg.delayed_settings applies at its exact iteration inside the
    epoch (reference train.py:278-291), rebuilding the step program."""
    ann_file, img_prefix, root = synth
    import train as train_mod
    from stmask_tpu import config as config_mod

    real_get = config_mod.get_config

    def with_delay(name):
        cfg = real_get(name)
        # epoch_size = 2 videos / batch 2 = 1? No: index has one clip per
        # video pair -> keep max_iter small; fire the change at iter 2
        return cfg.replace(delayed_settings=((2, (('conf_alpha', 2.0),)),))

    monkeypatch.setattr(config_mod, 'get_config', with_delay)
    argv = ['--config', 'STMask_plus_resnet50', '--batch_size', '2',
            '--ann_file', ann_file, '--img_prefix', img_prefix,
            '--save_folder', os.path.join(root, 'weights_d'),
            '--log_folder', os.path.join(root, 'logs_d'),
            '--img_w', '128', '--img_h', '96',
            '--max_iter', '4', '--no_autoscale', '--save_interval', '100',
            '--num_workers', '2']
    assert train_mod.main(argv) == 0
    out = capsys.readouterr().out
    assert "Applying delayed settings: {'conf_alpha': 2.0}" in out
