"""PyTorch STMask checkpoint -> flax params converter.

Maps the reference ``state_dict`` layout (``STMask.py:127-188`` save/load,
CharlesShang-DCNv2 ``conv_offset_mask`` packing, mmcv DeformConv2d offsets)
onto this framework's module tree:

  * conv weights OIHW -> HWIO; linear [out,in] -> [in,out];
  * BatchNorm (weight, bias, running_mean, running_var) ->
    FrozenBatchNorm (scale, bias, mean, var);
  * DCNv2 offset-mask conv channels pass through unchanged: the CUDA kernel
    reads the (o1‖o2) concat (dy, dx)-interleaved per tap, so the first 2K
    output channels are already the canonical layout
    (``ops.deform_conv.dcn_v2_offsets`` slices, never permutes);
  * FCB conv_offset 1x1 and DeformConv2d adaption weights map directly (the
    interleaved (dy, dx) tap layout rides along with the output channels);
  * legacy keys (``backbone.layer*`` without the s, extra fpn downsamples)
    are dropped exactly like ``STMask.py:136-144``.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

from .config import STMaskConfig

# proto_net Sequential conv indices -> MakeNet conv names
# (conv relu conv relu conv relu upsample relu conv relu conv)
_PROTO_IDX = {0: 'conv0', 2: 'conv1', 4: 'conv2', 8: 'conv4', 10: 'conv5'}
_EXTRA_IDX = {0: 0, 2: 1}  # Sequential (conv relu)*2

_BN_MAP = {'weight': 'scale', 'bias': 'bias',
           'running_mean': 'mean', 'running_var': 'var'}


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def map_torch_key(key: str) -> Optional[Tuple[Tuple[str, ...], str]]:
    """torch state_dict key -> (flax path, kind).

    kind in {conv, bias, bn, linear, raw}; returns None for keys to drop.
    """
    if key.endswith('num_batches_tracked'):
        return None
    parts = key.split('.')

    # ---- backbone ----
    if parts[0] == 'backbone':
        if parts[1] == 'conv1':
            return ('backbone', 'conv1', 'kernel'), 'conv'
        if parts[1] == 'bn1':
            return ('backbone', 'bn1', _BN_MAP[parts[2]]), 'bn'
        if parts[1] == 'layers':
            s, b = parts[2], parts[3]
            blk = f'layer{s}_{b}'
            rest = parts[4:]
            if rest[0] in ('conv1', 'conv3'):
                return ('backbone', blk, rest[0], 'kernel'), 'conv'
            if rest[0] == 'conv2':
                if len(rest) == 2 and rest[1] == 'weight':
                    return ('backbone', blk, 'conv2', 'kernel'), 'conv'
                if len(rest) == 2 and rest[1] == 'bias':
                    return ('backbone', blk, 'conv2', 'bias'), 'raw'
                if rest[1] == 'conv_offset_mask':
                    leaf = 'kernel' if rest[2] == 'weight' else 'bias'
                    kind = 'conv' if rest[2] == 'weight' else 'raw'
                    return ('backbone', blk, 'conv2', 'conv_offset_mask',
                            leaf), kind
            if rest[0] in ('bn1', 'bn2', 'bn3'):
                return ('backbone', blk, rest[0], _BN_MAP[rest[1]]), 'bn'
            if rest[0] == 'downsample':
                if rest[1] == '0':
                    return ('backbone', blk, 'downsample_conv',
                            'kernel'), 'conv'
                return ('backbone', blk, 'downsample_bn',
                        _BN_MAP[rest[2]]), 'bn'
        # legacy 'backbone.layerN' keys dropped (STMask.py:137-139)
        return None

    # ---- fpn ----
    if parts[0] == 'fpn':
        kinds = {'lat_layers': 'lat', 'pred_layers': 'pred',
                 'downsample_layers': 'downsample'}
        if parts[1] in kinds:
            leaf = 'kernel' if parts[3] == 'weight' else 'bias'
            kind = 'conv' if parts[3] == 'weight' else 'raw'
            return ('fpn', f'{kinds[parts[1]]}_{parts[2]}', leaf), kind
        return None

    # ---- proto_net ----
    if parts[0] == 'proto_net':
        idx = int(parts[1])
        if idx not in _PROTO_IDX:
            return None
        leaf = 'kernel' if parts[2] == 'weight' else 'bias'
        kind = 'conv' if parts[2] == 'weight' else 'raw'
        return ('proto_net', _PROTO_IDX[idx], leaf), kind

    # ---- prediction head (shared parent = prediction_layers.0) ----
    if parts[0] == 'prediction_layers':
        if parts[1] != '0':
            return None  # non-parent modules carry no params when shared
        rest = parts[2:]
        if rest[0] == 'upfeature':
            leaf = 'kernel' if rest[2] == 'weight' else 'bias'
            kind = 'conv' if rest[2] == 'weight' else 'raw'
            return ('prediction_head', 'upfeature', leaf), kind
        m = re.match(r'(conf|bbox|track|mask)_extra', rest[0])
        if m:
            idx = _EXTRA_IDX[int(rest[1])]
            leaf = 'kernel' if rest[2] == 'weight' else 'bias'
            kind = 'conv' if rest[2] == 'weight' else 'raw'
            return ('prediction_head', f'{m.group(1)}_extra_{idx}',
                    leaf), kind
        m = re.match(r'(conf|bbox|track|mask|centerness)_layer', rest[0])
        if m:
            k = rest[1]
            branch = m.group(1)
            if len(rest) == 3:       # plain conv bank
                leaf = 'kernel' if rest[2] == 'weight' else 'bias'
                kind = 'conv' if rest[2] == 'weight' else 'raw'
                return ('prediction_head', f'{branch}_layer_{k}',
                        leaf), kind
            # FeatureAlign (FCB) bank
            align = f'{branch}_align_{k}'
            if rest[2] == 'conv_offset':
                return ('prediction_head', align, 'conv_offset',
                        'kernel'), 'conv'
            if rest[2] == 'conv_adaption':
                return ('prediction_head', align, 'adaption_kernel'), 'conv'
            if rest[2] == 'conv':
                leaf = 'kernel' if rest[3] == 'weight' else 'bias'
                kind = 'conv' if rest[3] == 'weight' else 'raw'
                return ('prediction_head', align, 'conv', leaf), kind
        return None

    # ---- temporal net ----
    if parts[0] == 'TemporalNet':
        name = parts[1]
        if name.startswith('conv'):
            leaf = 'kernel' if parts[2] == 'weight' else 'bias'
            kind = 'conv' if parts[2] == 'weight' else 'raw'
            return ('temporal_net', name, leaf), kind
        if name in ('fc', 'fc_coeff'):
            leaf = 'kernel' if parts[2] == 'weight' else 'bias'
            kind = 'linear' if parts[2] == 'weight' else 'raw'
            return ('temporal_net', name, leaf), kind
        return None

    if parts[0] == 'semantic_seg_conv':
        leaf = 'kernel' if parts[1] == 'weight' else 'bias'
        kind = 'conv' if parts[1] == 'weight' else 'raw'
        return ('semantic_seg_conv', leaf), kind

    return None


def convert_state_dict(state_dict: Dict[str, 'np.ndarray']) -> Dict:
    """torch state_dict (tensors or numpy) -> nested flax params dict."""
    tree: Dict = {}
    unmapped = []
    for key, val in state_dict.items():
        mapped = map_torch_key(key)
        if mapped is None:
            unmapped.append(key)
            continue
        path, kind = mapped
        arr = np.asarray(val.detach().cpu().numpy()
                         if hasattr(val, 'detach') else val)
        if kind == 'conv':
            arr = _conv_w(arr)
        elif kind == 'linear':
            arr = arr.T
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = arr
    if unmapped:
        kept = [k for k in unmapped if 'num_batches' not in k]
        if kept:
            print(f'convert: dropped {len(kept)} unmapped keys, e.g. '
                  f'{kept[:5]}')
    return {'params': tree}


def load_torch_checkpoint(path: str) -> Dict:
    import torch
    sd = torch.load(path, map_location='cpu')
    if 'state_dict' in sd:
        sd = sd['state_dict']
    return convert_state_dict(sd)


def verify_against(params_converted: Dict, params_init: Dict) -> None:
    """Shape-check the converted tree against a freshly initialized one;
    raises on mismatch (the analog of the reference's load-time diff print,
    STMask.py:146-151)."""
    import jax
    flat_c = dict(jax.tree_util.tree_flatten_with_path(params_converted)[0])
    flat_i = dict(jax.tree_util.tree_flatten_with_path(params_init)[0])
    missing = [k for k in flat_i if k not in flat_c]
    extra = [k for k in flat_c if k not in flat_i]
    bad = [k for k in flat_i if k in flat_c
           and flat_i[k].shape != flat_c[k].shape]
    if missing:
        print('not in checkpoint (xavier-init kept):',
              [jax.tree_util.keystr(k) for k in missing])
    if extra:
        print('in checkpoint but not model:',
              [jax.tree_util.keystr(k) for k in extra])
    if bad:
        raise ValueError(
            'shape mismatches: '
            + str([(jax.tree_util.keystr(k), flat_i[k].shape,
                    flat_c[k].shape) for k in bad]))


def merge_params(params_init: Dict, params_converted: Dict) -> Dict:
    """Overlay converted weights on an initialized tree, keeping init values
    for anything absent (reference init_weights partial-load semantics,
    STMask.py:157-188).  Accepts either full variables dicts ({'params': ..})
    or bare param trees on either side."""
    import jax

    # align the optional top-level 'params' wrapper
    if isinstance(params_init, dict) and 'params' in params_init \
            and 'params' not in (params_converted or {}):
        inner = merge_params(params_init['params'], params_converted)
        return {**params_init, 'params': inner}
    if isinstance(params_converted, dict) and 'params' in params_converted \
            and 'params' not in params_init:
        return merge_params(params_init, params_converted['params'])

    def merge(init_node, conv_node):
        if not isinstance(init_node, dict):
            return conv_node if conv_node is not None else init_node
        out = {}
        for k, v in init_node.items():
            c = conv_node.get(k) if isinstance(conv_node, dict) else None
            out[k] = merge(v, c)
        return out

    merged = merge(params_init, params_converted)

    def cast(leaf, ref):
        import jax.numpy as jnp
        arr = jnp.asarray(leaf, dtype=ref.dtype)
        if arr.shape != ref.shape:
            raise ValueError(f'shape mismatch {arr.shape} vs {ref.shape}')
        return arr

    return jax.tree_util.tree_map(cast, merged, params_init)
