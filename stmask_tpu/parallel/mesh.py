"""Device mesh + sharding helpers — the distributed layer.

The reference's only parallelism is single-node ``nn.DataParallel``
(``train.py:153-175``) plus an *unused* distributed sampler
(``datasets/loader/sampler.py:57-138``).  The TPU-native replacement is one
first-class layer: a ``jax.sharding.Mesh`` with the batch sharded over the
``data`` axis — XLA's gradient all-reduce over ICI is the moral equivalent
of DataParallel's gather+mean (``train.py:310``) — with multi-host DCN via
``jax.distributed.initialize`` and per-host input sharding.  Eval
parallelism shards whole *videos* across chips (tracking is sequential
within a video, reference ``track_TF.py:43``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = 'data') -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(mesh: Mesh, batch: Any, axis_name: str = 'data') -> Any:
    """Shard every leaf along its leading (batch) dimension.

    Multi-process: each host passes its LOCAL batch (the shard its
    ``ClipLoader(num_shards=process_count, shard_id=process_index)``
    loaded) and the leaves are assembled into global arrays whose
    leading dim is ``process_count * local_batch`` — the jax analog of
    the reference's per-rank ``DistributedGroupSampler`` feeding
    DataParallel (sampler.py:57-138)."""
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree over the mesh (params/optimizer state).
    Multi-process: every host holds the identical full value."""
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) initialization; no-op on a single host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
