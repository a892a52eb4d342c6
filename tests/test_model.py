import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stmask_tpu.config import get_config
from stmask_tpu.models import STMask

# small test config: tiny input, R50 structure shrunk
TINY = get_config('STMask_resnet50').replace(
    img_w=128, img_h=96,
    backbone=get_config('STMask_resnet50').backbone,
)

TINY_DCN = get_config('STMask_plus_resnet50').replace(img_w=128, img_h=96)
TINY_ADA = get_config('STMask_plus_resnet50_ada').replace(img_w=128, img_h=96)


def _init(cfg, train=False, frames=1):
    model = STMask(cfg)
    rng = jax.random.PRNGKey(0)
    if train:
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (1, 2, cfg.pad_h, cfg.pad_w, 3))
        params = model.init(rng, x, train=True)
    else:
        x = jax.random.normal(jax.random.PRNGKey(1),
                              (1, cfg.pad_h, cfg.pad_w, 3))
        params = model.init(rng, x, train=False)
    return model, params, x


@pytest.mark.parametrize('cfg', [TINY], ids=['r50'])
def test_eval_forward_shapes(cfg):
    model, params, x = _init(cfg)
    out = model.apply(params, x, train=False)
    p = cfg.num_priors
    assert out['loc'].shape == (1, p, 4)
    assert out['conf'].shape == (1, p, cfg.num_classes)
    assert out['mask_coeff'].shape == (1, p, 32)
    assert out['track'].shape == (1, p, cfg.embed_dim)
    assert out['centerness'].shape == (1, p, 1)
    # proto at 2x P3 resolution
    assert out['proto'].shape == (1, cfg.pad_h // 4, cfg.pad_w // 4, 32)
    # conf softmaxed
    np.testing.assert_allclose(np.asarray(out['conf']).sum(-1), 1.0,
                               atol=1e-5)
    # track embeddings unit-norm
    norms = np.linalg.norm(np.asarray(out['track']), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    # TF features at the selected level (P4)
    h4 = cfg.feature_shapes()[cfg.correlation_selected_layer]
    assert out['fpn_feat'].shape == (1, h4[0], h4[1], 256)
    assert out['T2S_feat'].shape == (1, h4[0], h4[1], 256)


def test_train_forward_has_corr_feat():
    model, params, x = _init(TINY, train=True)
    out = model.apply(params, x, train=True)
    h4, w4 = TINY.feature_shapes()[TINY.correlation_selected_layer]
    corr_ch = TINY.correlation_patch_size ** 2 + 2 * 256
    assert out['T2S_concat_feat'].shape == (1, h4, w4, corr_ch)
    assert out['loc'].shape[0] == 2  # both frames flattened


@pytest.mark.parametrize('cfg', [TINY_DCN, TINY_ADA], ids=['dcn', 'ada'])
def test_dcn_variants_forward(cfg):
    model, params, x = _init(cfg)
    out = model.apply(params, x, train=False)
    assert out['loc'].shape == (1, cfg.num_priors, 4)
    assert np.all(np.isfinite(np.asarray(out['loc'])))


def test_focal_conf_bias_init():
    """use_sigmoid_focal_loss initializes conf bias to the reference's pi
    scheme (STMask.py:180-184): background +log((1-pi)/pi), classes
    -log((1-pi)/pi)."""
    import numpy as np

    cfg = TINY.replace(use_sigmoid_focal_loss=True)
    model = STMask(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (1, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x, train=False)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    b0 = float(np.log((1 - cfg.focal_loss_init_pi)
                      / cfg.focal_loss_init_pi))
    found = 0
    for path, leaf in flat:
        keys = [getattr(p, 'key', '') for p in path]
        if any('conf_layer' in str(k) for k in keys) and 'bias' in str(
                keys[-1]):
            bias = np.asarray(leaf).reshape(-1, cfg.num_classes)
            np.testing.assert_allclose(bias[:, 0], b0, rtol=1e-6)
            np.testing.assert_allclose(bias[:, 1:], -b0, rtol=1e-6)
            found += 1
    assert found >= 1

    # FCB path: the FeatureAlign final conv gets the same init
    cfg2 = TINY_ADA.replace(use_sigmoid_focal_loss=True)
    model2 = STMask(cfg2)
    params2 = model2.init(jax.random.PRNGKey(0), x, train=False)
    flat2 = jax.tree_util.tree_flatten_with_path(params2)[0]
    found2 = 0
    for path, leaf in flat2:
        keys = [str(getattr(p, 'key', '')) for p in path]
        if any('conf_align' in k for k in keys) and 'conv' in keys[-2] \
                and keys[-1] == 'bias':
            bias = np.asarray(leaf).reshape(-1, cfg2.num_classes)
            np.testing.assert_allclose(bias[:, 0], b0, rtol=1e-6)
            np.testing.assert_allclose(bias[:, 1:], -b0, rtol=1e-6)
            found2 += 1
    assert found2 >= 1
