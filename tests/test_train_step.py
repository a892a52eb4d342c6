import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stmask_tpu.config import get_config
from stmask_tpu.models import STMask
from stmask_tpu.train import build_train_step, learning_rate, autoscale
from stmask_tpu.parallel import make_mesh, replicate, shard_batch

# NOTE: max_gt_per_frame deliberately != 4 (the box-coordinate dim) so axis
# mixups in gt reshapes fail loudly.
TINY = get_config('STMask_plus_resnet50').replace(
    img_w=128, img_h=96, max_gt_per_frame=6, masks_to_train=16)


def _synthetic_batch(cfg, b=1, rng=None):
    rng = rng or np.random.RandomState(0)
    g = cfg.max_gt_per_frame
    hp, wp = cfg.pad_h // 4, cfg.pad_w // 4
    images = rng.randn(b, 2, cfg.pad_h, cfg.pad_w, 3).astype(np.float32)
    boxes = np.zeros((b, 2, g, 4), np.float32)
    labels = np.zeros((b, 2, g), np.int32)
    ids = np.zeros((b, 2, g), np.int32)
    valid = np.zeros((b, 2, g), bool)
    masks = np.zeros((b, 2, g, hp, wp), np.uint8)
    for i in range(b):
        for f in range(2):
            # two objects persisting across both frames
            for j, (x1, y1, x2, y2) in enumerate(
                    [(0.1, 0.1, 0.45, 0.5), (0.55, 0.45, 0.9, 0.9)]):
                dx = 0.02 * f
                boxes[i, f, j] = [x1 + dx, y1, x2 + dx, y2]
                labels[i, f, j] = j + 2
                ids[i, f, j] = i * 10 + j + 1
                valid[i, f, j] = True
                masks[i, f, j,
                      int(y1 * hp):int(y2 * hp),
                      int((x1 + dx) * wp):int((x2 + dx) * wp)] = 1
    return {
        'images': jnp.asarray(images), 'boxes': jnp.asarray(boxes),
        'labels': jnp.asarray(labels), 'ids': jnp.asarray(ids),
        'valid': jnp.asarray(valid), 'masks_proto': jnp.asarray(masks),
    }


@pytest.fixture(scope='module')
def setup():
    model = STMask(TINY)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, 2, TINY.pad_h, TINY.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x, train=True)
    return model, params


def test_train_step_losses_finite_and_grads_flow(setup):
    model, params = setup
    train_step, init_state = build_train_step(TINY, model)
    state = init_state(params)
    batch = _synthetic_batch(TINY)
    state2, metrics = train_step(state, batch)

    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)), f'{k} not finite: {v}'
    expected = {'BIoU', 'C', 'center', 'M', 'T', 'B_shift', 'M_shift',
                'total', 'lr'}
    assert expected <= set(metrics)
    assert int(state2.step) == 1

    # parameters actually moved (grads nonzero somewhere meaningful)
    leaves_before = jax.tree_util.tree_leaves(state.params)
    leaves_after = jax.tree_util.tree_leaves(state2.params)
    moved = sum(float(jnp.abs(a - b).sum()) for a, b in
                zip(leaves_before, leaves_after))
    assert moved > 0


def test_loss_decreases_on_repeat(setup):
    model, params = setup
    train_step, init_state = build_train_step(TINY, model)
    state = init_state(params)
    batch = _synthetic_batch(TINY)
    first = None
    last = None
    for i in range(5):
        state, metrics = train_step(state, batch)
        if first is None:
            first = float(metrics['total'])
        last = float(metrics['total'])
    assert np.isfinite(last)
    assert last < first  # overfits a fixed batch


def test_lr_schedule():
    cfg = TINY.replace(lr=1e-3, lr_warmup_init=1e-4, lr_warmup_until=100,
                       lr_steps=(1000, 2000), gamma=0.1)
    assert np.isclose(float(learning_rate(cfg, 0)), 1e-4)
    assert np.isclose(float(learning_rate(cfg, 100)), 1e-3)
    assert np.isclose(float(learning_rate(cfg, 1500)), 1e-4)
    assert np.isclose(float(learning_rate(cfg, 2500)), 1e-5)


def test_autoscale():
    # reference train.py:88-96: factor = batch*2/8 (baseline 4 clips)
    cfg = autoscale(TINY.replace(lr=1e-3, max_iter=1000, lr_steps=(500,)),
                    batch_size=8)
    assert np.isclose(cfg.lr, 2e-3)
    assert cfg.max_iter == 500
    assert cfg.lr_steps == (250,)
    assert autoscale(TINY.replace(lr=1e-3), batch_size=4).lr == 1e-3


def test_train_step_sharded_8_devices(setup):
    model, params = setup
    assert jax.device_count() == 8, 'conftest must provide 8 CPU devices'
    train_step, init_state = build_train_step(TINY, model)
    mesh = make_mesh()
    state = init_state(params)
    state = replicate(mesh, state)
    batch = shard_batch(mesh, _synthetic_batch(TINY, b=8))
    state2, metrics = train_step(state, batch)
    assert np.isfinite(float(metrics['total']))
    assert int(state2.step) == 1


def test_frozen_bn_params_do_not_update(setup):
    """FrozenBatchNorm stats must never move (they are running statistics,
    not weights — SGD updating them can push var negative and NaN the
    whole forward via rsqrt), and with freeze_bn the BN affine is frozen
    too (reference STMask.freeze_bn)."""
    model, params = setup

    def bn_leaves(tree, wanted):
        out = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            names = [str(getattr(k, 'key', k)) for k in path]
            if any(n in ('bn1', 'bn2', 'bn3') or n.endswith('_bn')
                   for n in names) and names[-1] in wanted:
                out[jax.tree_util.keystr(path)] = np.asarray(leaf)
        return out

    batch = _synthetic_batch(TINY)
    for freeze, affine_may_move in ((True, False), (False, True)):
        cfg = TINY.replace(freeze_bn=freeze, lr=1e-2, lr_warmup_until=0)
        train_step, init_state = build_train_step(cfg, model)
        state2, _ = train_step(init_state(params), batch)

        stats0 = bn_leaves(params, ('mean', 'var'))
        stats1 = bn_leaves(state2.params, ('mean', 'var'))
        for k in stats0:
            np.testing.assert_array_equal(stats0[k], stats1[k], err_msg=k)

        aff0 = bn_leaves(params, ('scale', 'bias'))
        aff1 = bn_leaves(state2.params, ('scale', 'bias'))
        moved = any(not np.array_equal(aff0[k], aff1[k]) for k in aff0)
        assert moved == affine_may_move, f'freeze_bn={freeze}'


def test_remat_step_matches_plain(setup):
    """remat=True (jax.checkpoint around the forward) must be a pure
    memory/FLOPs trade: same losses and same updated params as the plain
    step.  This is the fit-FCB-in-HBM path (overfit_sanity --remat)."""
    model, params = setup
    batch = _synthetic_batch(TINY)

    plain_step, init_state = build_train_step(TINY, model)
    remat_step, _ = build_train_step(TINY, model, remat=True)
    s_plain, m_plain = plain_step(init_state(params), batch)
    s_remat, m_remat = remat_step(init_state(params), batch)

    for k in m_plain:
        np.testing.assert_allclose(np.asarray(m_plain[k]),
                                   np.asarray(m_remat[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    a = jax.tree_util.tree_leaves(s_plain.params)
    b = jax.tree_util.tree_leaves(s_remat.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)
