"""Convert a reference PyTorch STMask checkpoint to an orbax checkpoint.

Usage:
  python scripts/convert_weights.py --config STMask_plus_resnet50 \
      --torch_ckpt STMask_plus_resnet50.pth --out weights/converted
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--config', required=True)
    p.add_argument('--torch_ckpt', required=True)
    p.add_argument('--out', required=True)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from stmask_tpu.config import get_config
    from stmask_tpu.convert import (load_torch_checkpoint, merge_params,
                                    verify_against)
    from stmask_tpu.models import STMask

    cfg = get_config(args.config)
    model = STMask(cfg)
    x0 = jnp.zeros((1, cfg.pad_h, cfg.pad_w, 3))
    params = model.init(jax.random.PRNGKey(0), x0, train=False)

    converted = load_torch_checkpoint(args.torch_ckpt)
    verify_against(converted, params)
    merged = merge_params(params, converted)

    ocp.StandardCheckpointer().save(os.path.abspath(args.out), merged,
                                    force=True)
    print('wrote', args.out)


if __name__ == '__main__':
    main()
