"""Full-model forward parity: flax + converter vs the torch mirror."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stmask_tpu.config import get_config  # noqa: E402
from stmask_tpu.convert import convert_state_dict, merge_params  # noqa: E402
from stmask_tpu.models import STMask  # noqa: E402

from torch_mirror import TSTMask  # noqa: E402

def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)


def _randomize_dcn(module):
    """Give every DCN offset predictor nonzero weights so the parity test
    exercises the offset-channel layout (zero offsets would pass under any
    permutation)."""
    from torch_mirror import NaiveDCNv2, TFeatureAlign
    for m in module.modules():
        with torch.no_grad():
            if isinstance(m, NaiveDCNv2):
                m.conv_offset_mask.weight.normal_(std=0.01)
                m.conv_offset_mask.bias.normal_(std=0.5)
            if isinstance(m, TFeatureAlign) and hasattr(m, 'conv_offset'):
                m.conv_offset.weight.normal_(std=0.1)


@pytest.mark.slow
@pytest.mark.parametrize('cfg_name,mirror_kwargs', [
    ('STMask_resnet50', {}),
    ('STMask_plus_resnet50', dict(dcn_layers=(0, 4, 6, 3), dcn_interval=2)),
    ('STMask_plus_resnet50_ada',
     dict(dcn_layers=(0, 4, 6, 3), dcn_interval=2, fcb_ada=True)),
    ('STMask_plus_resnet50_ali',
     dict(dcn_layers=(0, 4, 6, 3), dcn_interval=2, fcb_ali=True)),
    ('STMask_plus_base',  # R101-DCN-interval3 (the reference flagship depth)
     dict(layers=(3, 4, 23, 3), dcn_layers=(0, 4, 23, 3), dcn_interval=3)),
])
def test_full_forward_parity(cfg_name, mirror_kwargs):
    cfg = get_config(cfg_name).replace(img_w=128, img_h=96)
    torch.manual_seed(0)
    tmodel = TSTMask(num_classes=cfg.num_classes, **mirror_kwargs).eval()
    _randomize_bn(tmodel)
    _randomize_dcn(tmodel)

    x = torch.randn(1, 3, cfg.pad_h, cfg.pad_w)
    with torch.no_grad():
        ref = tmodel(x)

    # convert weights into the flax tree
    converted = convert_state_dict(tmodel.mirror_state_dict())
    model = STMask(cfg)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = model.init(jax.random.PRNGKey(0), xj, train=False)
    params = merge_params(params, converted['params'])

    out = model.apply(params, xj, train=False)

    def cmp(key, ref_t, mine, atol):
        r = ref_t.numpy()
        m = np.asarray(mine)
        assert r.shape == m.shape, (key, r.shape, m.shape)
        np.testing.assert_allclose(m, r, atol=atol, err_msg=key)

    cmp('loc', ref['loc'], out['loc'], 2e-3)
    cmp('conf', ref['conf'], out['conf'], 1e-4)
    cmp('centerness', ref['centerness'], out['centerness'], 1e-4)
    cmp('mask_coeff', ref['mask_coeff'], out['mask_coeff'], 2e-3)
    cmp('track', ref['track'], out['track'], 1e-3)
    cmp('proto', ref['proto'], out['proto'], 2e-3)
    cmp('T2S_feat', ref['T2S_feat'].permute(0, 2, 3, 1), out['T2S_feat'],
        2e-3)
    cmp('fpn_feat', ref['fpn_feat'].permute(0, 2, 3, 1), out['fpn_feat'],
        2e-3)
