"""Numerical parity of converted building blocks against torch (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip('torch')

import flax.linen as nn  # noqa: E402

from stmask_tpu.convert import convert_state_dict, map_torch_key  # noqa: E402
from stmask_tpu.models.layers import FrozenBatchNorm, resize_bilinear  # noqa: E402


def test_conv_weight_parity():
    tc = torch.nn.Conv2d(3, 8, (3, 5), padding=(1, 2))
    x = torch.randn(2, 3, 9, 11)
    with torch.no_grad():
        ref = tc(x).numpy()

    w = np.transpose(tc.weight.detach().numpy(), (2, 3, 1, 0))
    b = tc.bias.detach().numpy()
    conv = nn.Conv(8, (3, 5), padding=(1, 2))
    params = {'params': {'kernel': jnp.asarray(w), 'bias': jnp.asarray(b)}}
    out = conv.apply(params, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_frozen_bn_parity():
    tb = torch.nn.BatchNorm2d(6).eval()
    with torch.no_grad():
        tb.weight.copy_(torch.randn(6))
        tb.bias.copy_(torch.randn(6))
        tb.running_mean.copy_(torch.randn(6))
        tb.running_var.copy_(torch.rand(6) + 0.5)
    x = torch.randn(2, 6, 4, 4)
    with torch.no_grad():
        ref = tb(x).numpy()

    bn = FrozenBatchNorm(6)
    params = {'params': {
        'scale': jnp.asarray(tb.weight.detach().numpy()),
        'bias': jnp.asarray(tb.bias.detach().numpy()),
        'mean': jnp.asarray(tb.running_mean.numpy()),
        'var': jnp.asarray(tb.running_var.numpy()),
    }}
    out = bn.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


def test_bilinear_resize_parity():
    x = torch.randn(1, 3, 12, 20)
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            x, size=(24, 40), mode='bilinear', align_corners=False).numpy()
    out = resize_bilinear(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                          (24, 40))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=1e-5)


def test_key_mapping_coverage():
    cases = {
        'backbone.conv1.weight': ('backbone', 'conv1', 'kernel'),
        'backbone.bn1.running_mean': ('backbone', 'bn1', 'mean'),
        'backbone.layers.2.5.conv2.conv_offset_mask.weight':
            ('backbone', 'layer2_5', 'conv2', 'conv_offset_mask', 'kernel'),
        'backbone.layers.0.0.downsample.1.running_var':
            ('backbone', 'layer0_0', 'downsample_bn', 'var'),
        'fpn.lat_layers.1.bias': ('fpn', 'lat_1', 'bias'),
        'fpn.downsample_layers.0.weight': ('fpn', 'downsample_0', 'kernel'),
        'proto_net.8.weight': ('proto_net', 'conv4', 'kernel'),
        'prediction_layers.0.upfeature.0.weight':
            ('prediction_head', 'upfeature', 'kernel'),
        'prediction_layers.0.conf_extra.2.weight':
            ('prediction_head', 'conf_extra_1', 'kernel'),
        'prediction_layers.0.bbox_layer.1.bias':
            ('prediction_head', 'bbox_layer_1', 'bias'),
        'prediction_layers.0.conf_layer.2.conv_adaption.weight':
            ('prediction_head', 'conf_align_2', 'adaption_kernel'),
        'prediction_layers.0.conf_layer.0.conv_offset.weight':
            ('prediction_head', 'conf_align_0', 'conv_offset', 'kernel'),
        'prediction_layers.0.centerness_layer.0.weight':
            ('prediction_head', 'centerness_layer_0', 'kernel'),
        'TemporalNet.fc_coeff.weight': ('temporal_net', 'fc_coeff',
                                        'kernel'),
    }
    for key, path in cases.items():
        got = map_torch_key(key)
        assert got is not None, key
        assert got[0] == path, (key, got[0], path)

    # dropped keys
    assert map_torch_key('backbone.bn1.num_batches_tracked') is None
    assert map_torch_key('prediction_layers.1.upfeature.0.weight') is None
    assert map_torch_key('backbone.layer1.0.conv1.weight') is None


def test_convert_state_dict_tree():
    sd = {
        'backbone.conv1.weight': torch.randn(64, 3, 7, 7),
        'TemporalNet.fc.weight': torch.randn(4, 1024),
        'TemporalNet.fc.bias': torch.randn(4),
    }
    tree = convert_state_dict(sd)
    assert tree['params']['backbone']['conv1']['kernel'].shape == \
        (7, 7, 3, 64)
    assert tree['params']['temporal_net']['fc']['kernel'].shape == (1024, 4)
    assert tree['params']['temporal_net']['fc']['bias'].shape == (4,)
