import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from stmask_tpu.config import get_config
from stmask_tpu.data import ClipLoader, YTVISDataset
from stmask_tpu.models import STMask
from stmask_tpu.ops.anchors import all_priors
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

WHICH = os.environ.get('WHICH', 'M')


def loss_fn(params, batch):
    preds = model.apply(params, batch['images'], train=True)
    flat = lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:])
    gt = {k: flat(batch[k])
          for k in ('boxes', 'labels', 'ids', 'valid', 'masks_proto')}

    def tnet(x):
        return model.apply(params, x, method=STMask.temporal_shift)

    losses = L.compute_losses(cfg, preds, gt, priors, tnet)
    if WHICH == 'all':
        total = sum(losses.values())
    else:
        total = losses[WHICH]
    return total, losses


(total, losses), grads = jax.jit(
    jax.value_and_grad(loss_fn, has_aux=True))(params, batch)
print('WHICH =', WHICH)
for k, v in losses.items():
    print('loss', k, float(v))
print('total', float(total))
bad = []
for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
    if not bool(jnp.isfinite(leaf).all()):
        bad.append(jax.tree_util.keystr(path))
print('nan grads:', len(bad))
for b in bad[:12]:
    print('  ', b)
