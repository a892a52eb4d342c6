import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'scripts'))

import numpy as np
import jax
import jax.numpy as jnp

from stmask_tpu.config import get_config
from stmask_tpu.data import ClipLoader, YTVISDataset
from stmask_tpu.models import STMask
from stmask_tpu.ops.anchors import all_priors
from stmask_tpu.ops.boxes import decode, center_size, point_form
from stmask_tpu.ops.masks import generate_mask
from stmask_tpu.train import losses as L

cfg = get_config('STMask_plus_resnet50')
ds = YTVISDataset('/tmp/overfit_sanity/train.json', '/tmp/overfit_sanity/imgs')
loader = ClipLoader(cfg, ds, batch_size=4, num_workers=4)
batch = next(iter(loader.epoch(0)))
batch = jax.tree_util.tree_map(jnp.asarray, batch)
model = STMask(cfg)
params = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, 2, cfg.pad_h, cfg.pad_w, 3)), train=True)
priors = jnp.asarray(all_priors(cfg))


@jax.jit
def diag(params, batch):
    preds = model.apply(params, batch['images'], train=True)
    flat = lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
    gt = {k: flat(batch[k])
          for k in ('boxes', 'labels', 'ids', 'valid', 'masks_proto')}
    t = L.match_batch(cfg, priors, preds, gt)
    out = {}
    for k in ('loc', 'conf', 'mask_coeff', 'proto', 'T2S_concat_feat',
              'centerness', 'track'):
        out[f'finite_{k}'] = jnp.isfinite(preds[k]).all()
        out[f'absmax_{k}'] = jnp.abs(preds[k]).max()
    out['pos'] = t.pos.sum()
    out['finite_loc_t'] = jnp.isfinite(t.loc_t).all()

    proto0 = preds['proto'][0]
    coeff0 = preds['mask_coeff'][0]
    loc0 = preds['loc'][0]
    idx, valid = L._top_pos_indices(t.pos[0], cfg.masks_to_train)
    box = decode(loc0[idx], priors[idx])
    out['finite_box'] = jnp.isfinite(box).all()
    cs = center_size(box)
    cs = jnp.concatenate([cs[:, :2], cs[:, 2:] * 1.2], 1)
    box2 = jnp.clip(point_form(cs), 1e-5, 1.0)
    pred = generate_mask(proto0, coeff0[idx], box2)
    out['finite_predmask'] = jnp.isfinite(pred).all()
    out['pred_minmax'] = jnp.stack([pred.min(), pred.max()])

    mask_t = gt['masks_proto'][0][t.idx_t[0][idx]].astype(jnp.float32)
    pre = L._bce(pred, mask_t)
    out['finite_bce'] = jnp.isfinite(pre).all()
    csize = center_size(box2)
    bw = jnp.maximum(csize[:, 2] * 160, 1.0)
    bh = jnp.maximum(csize[:, 3] * 96, 1.0)
    per = jnp.sum(pre, axis=(1, 2)) / bw / bh
    out['finite_per'] = jnp.isfinite(per).all()
    w = t.pos_w[0][idx] * valid
    out['finite_w'] = jnp.isfinite(w).all()
    out['M0'] = jnp.sum(w * per)
    out['M_full'] = L.lincomb_mask_loss(cfg, priors, preds, t,
                                        gt['masks_proto'])
    losses = L.compute_losses(cfg, preds, gt, priors, None)
    for k, v in losses.items():
        out[f'loss_{k}'] = v
    return out

res = diag(params, batch)
for k, v in res.items():
    print(k, np.asarray(v))
