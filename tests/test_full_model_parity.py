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

CFG = get_config('STMask_resnet50').replace(img_w=128, img_h=96)


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)


@pytest.mark.slow
def test_full_forward_parity():
    torch.manual_seed(0)
    tmodel = TSTMask(num_classes=CFG.num_classes).eval()
    _randomize_bn(tmodel)

    x = torch.randn(1, 3, CFG.pad_h, CFG.pad_w)
    with torch.no_grad():
        ref = tmodel(x)

    # convert weights into the flax tree
    converted = convert_state_dict(tmodel.mirror_state_dict())
    model = STMask(CFG)
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
