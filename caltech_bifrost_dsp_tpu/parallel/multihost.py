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
                n_chan: int | None = None,
                placement: str = "chan") -> Mesh:
    """('time', 'chan') mesh over every device in the (multi-host) slice.

    ``placement`` picks which axis spans processes (hosts):

    - ``"chan"`` (default — the production policy, SCALING.md §3): the
      'chan' axis crosses hosts, so only the packed-byte corner-turn
      slabs ride DCN (2.4-6.5 Gb/s/device at real time) and the
      once-per-window visibility ``psum`` plus the PFB halo stay on
      in-host ICI.  This matches the reference's own architecture of
      share-nothing frequency shards across servers
      (reference: pipeline/scripts/lwa352-pipeline.py:164-180).
    - ``"time"``: the 'time' axis crosses hosts (sequence parallelism
      over DCN); the psum then moves ~190 MB/device/window across the
      NIC — viable on 200/400 GbE only.
    """
    devices = jax.devices()
    nproc = jax.process_count()
    if placement not in ("time", "chan"):
        raise ValueError(f"unknown placement {placement!r}")
    if placement == "chan":
        if n_chan is None:
            n_chan = nproc
        if n_time is None:
            n_time = len(devices) // n_chan
        # jax.devices() orders by process: reshape so each COLUMN
        # (chan coordinate) is one process's devices
        arr = np.array(devices[:n_time * n_chan]).reshape(
            n_chan, n_time).T
    else:
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
