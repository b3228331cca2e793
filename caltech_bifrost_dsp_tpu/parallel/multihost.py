"""Multi-host mesh bring-up.

The reference scales across 8-9 servers by running share-nothing
processes coordinated only through etcd (reference:
lwa352_xeng_etcd_client.py).  The TPU framework instead forms ONE global
mesh across hosts: each host runs the same program under
``jax.distributed``, the ('time', 'chan') mesh spans every chip in the
slice, and the same shard_map programs (:mod:`.mesh`) run unchanged —
XLA routes collectives over ICI within a host and DCN between hosts.

Host-edge IO stays local: each host ingests the UDP streams for the
channels its chips own (the same frequency-sharded capture layout as the
reference), and the arming arithmetic (utils/timeutils) keeps
integration boundaries aligned across hosts without data-plane
communication.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host runtime.

    Explicit ``num_processes=1`` is a no-op.  With ALL arguments left
    None, delegates to bare ``jax.distributed.initialize()`` — on TPU
    pods the standard env metadata autodetects coordinator/count/id,
    and on a plain single-process host that call is itself a no-op-ish
    single-process init (never an error path that silently skips pod
    bring-up, which previously left multi-host runs on a fraction of
    the slice)."""
    if num_processes is not None and num_processes <= 1:
        return
    if (coordinator_address is None and num_processes is None
            and process_id is None):
        try:
            jax.distributed.initialize()
        except Exception as e:  # no cluster metadata: single host
            import warnings

            warnings.warn(
                "jax.distributed autodetect failed (%s); continuing "
                "single-process — multi-host runs must pass explicit "
                "coordinator_address/num_processes/process_id" % (e,))
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(n_time: int | None = None,
                n_chan: int | None = None) -> Mesh:
    """('time', 'chan') mesh over every device in the (multi-host) slice.

    Defaults: the 'time' axis spans hosts (sequence parallelism with DCN
    halo exchange once per accumulation is cheap), the 'chan' axis spans
    the chips within a host (the all_to_all corner-turn rides ICI).
    """
    devices = jax.devices()
    nproc = jax.process_count()
    if n_time is None:
        n_time = nproc
    if n_chan is None:
        n_chan = len(devices) // n_time
    arr = np.array(devices[:n_time * n_chan]).reshape(n_time, n_chan)
    return Mesh(arr, axis_names=("time", "chan"))


def local_channel_range(cfg, mesh: Mesh) -> tuple[int, int]:
    """The global channel slice owned by this process's devices (for
    wiring each host's capture engine to its frequency shard)."""
    n_chan_shards = mesh.shape["chan"]
    chan_per_shard = cfg.nchan // n_chan_shards
    local = [d for d in mesh.devices.ravel()
             if d.process_index == jax.process_index()]
    cols = sorted({int(np.argwhere(mesh.devices == d)[0][1])
                   for d in local})
    return cols[0] * chan_per_shard, (cols[-1] + 1) * chan_per_shard
