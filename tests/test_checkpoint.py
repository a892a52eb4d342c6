"""Checkpoint lifecycle: save/restore roundtrip, name codec, pruning."""

import numpy as np
import jax.numpy as jnp
import pytest

from stmask_tpu.train.checkpoint import (CheckpointManager, ckpt_name,
                                         parse_ckpt_name)


def test_name_codec():
    assert ckpt_name('STMask_plus_resnet50', 3, 10000) == \
        'STMask_plus_resnet50_3_10000'
    parsed = parse_ckpt_name('STMask_plus_resnet50_3_10000')
    assert parsed == ('STMask_plus_resnet50', 3, 10000, False)
    parsed = parse_ckpt_name('cfg_0_500_interrupt')
    assert parsed == ('cfg', 0, 500, True)
    assert parse_ckpt_name('garbage') is None


def test_save_restore_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path), 'testcfg')
    state = {'params': {'w': jnp.arange(6.0).reshape(2, 3)},
             'step': jnp.asarray(7)}
    path = mgr.save(state, epoch=1, iteration=100)
    target = {'params': {'w': jnp.zeros((2, 3))},
              'step': jnp.asarray(0)}
    restored = mgr.restore(path, target)
    np.testing.assert_allclose(np.asarray(restored['params']['w']),
                               np.arange(6.0).reshape(2, 3))
    assert int(restored['step']) == 7


def test_latest_and_interrupt_discovery(tmp_path):
    mgr = CheckpointManager(str(tmp_path), 'testcfg')
    state = {'x': jnp.zeros(2)}
    mgr.save(state, 0, 100)
    mgr.save(state, 0, 200)
    mgr.save(state, 0, 150, interrupt=True)
    assert mgr.get_latest().endswith('testcfg_0_200')
    assert mgr.get_interrupt().endswith('testcfg_0_150_interrupt')


def test_keep_latest_pruning(tmp_path):
    mgr = CheckpointManager(str(tmp_path), 'testcfg', keep_latest=2)
    state = {'x': jnp.zeros(2)}
    for it in (100, 200, 300):
        mgr.save(state, 0, it)
    import os
    names = sorted(os.listdir(tmp_path))
    assert 'testcfg_0_100' not in names
    assert 'testcfg_0_200' in names and 'testcfg_0_300' in names
