"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count`` (the JAX analog of testing
multi-node without a cluster).
"""

import os
import sys

# NOTE: the environment presets JAX_PLATFORMS=axon (TPU); tests must run on
# CPU with virtual devices, so force-override unless explicitly requested.
_flags = os.environ.get('XLA_FLAGS', '')
if 'host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

if os.environ.get('STMASK_TEST_TPU') != '1':
    os.environ['JAX_PLATFORMS'] = 'cpu'
    # a sitecustomize may have initialized jax already; the config update is
    # what actually sticks
    import jax
    jax.config.update('jax_platforms', 'cpu')
    # CPU test compiles get their own persistent-cache dir so a test run
    # never contends on the TPU cache's file lock with a concurrent
    # benchmark (two processes sharing one cache dir serialize on it —
    # see stmask_tpu/__init__.py and CLAUDE.md).
    if not os.environ.get('STMASK_NO_COMPILE_CACHE'):
        _cpu_cache = os.path.expanduser('~/.cache/jax_stmask_cpu')
        os.makedirs(_cpu_cache, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', _cpu_cache)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
