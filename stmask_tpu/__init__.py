"""stmask-tpu: a TPU-native one-stage video instance segmentation framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
STMask system (CVPR 2021 — spatial feature calibration + temporal fusion on
YOLACT), re-designed for TPU: static shapes, functional transforms, fused
kernels, mesh-sharded training, and a streaming per-video tracking scan.
"""

__version__ = '0.1.0'

import os as _os

# Persistent XLA compilation cache: first compiles of the full model are
# minutes; every later process reuses them.  STMASK_NO_COMPILE_CACHE=1
# opts out (concurrent processes serialize on the cache's file lock —
# e.g. the lockstep multi-process workers in tests/test_multiprocess.py).
try:
    import jax as _jax
    if (not _jax.config.jax_compilation_cache_dir
            and not _os.environ.get('STMASK_NO_COMPILE_CACHE')):
        # CPU-forced processes (the tests' CLI subprocesses run with
        # JAX_PLATFORMS=cpu) get the CPU cache dir the suite itself uses
        # (tests/conftest.py): entries are platform-keyed either way, but
        # sharing one dir with TPU work serializes both processes on the
        # cache's file lock (CLAUDE.md one-benchmark-at-a-time rule).
        _name = ('jax_stmask_cpu'
                 if _os.environ.get('JAX_PLATFORMS', '').startswith('cpu')
                 else 'jax_stmask')
        _cache = _os.path.expanduser('~/.cache/' + _name)
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update('jax_compilation_cache_dir', _cache)
        _jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
except Exception:  # pragma: no cover
    pass

from .config import REGISTRY, STMaskConfig, get_config  # noqa: F401
