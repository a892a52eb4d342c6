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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
