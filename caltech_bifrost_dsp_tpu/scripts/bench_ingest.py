"""Ingest benchmark: sustained capture -> gulp-assembly rate at the
production operating point, against the reference's real-time bar.

The reference sustains 25.9 Gb/s/pipeline with IB-Verbs kernel bypass,
and a production server runs FOUR capture pipelines (~104 Gb/s/host)
(reference: pipeline/lwa352_pipeline/blocks/capture_block.py:180-189,
pipeline-control/lwa352_pipeline_control/lwa352_xeng_etcd_client.py:16-26).
This bench drives N native C++ capture engines (one RX thread each, one
UDP port each — the per-pipeline-port layout of the reference server)
with N native paced blasters over loopback and reports the aggregate
loss-free sustained rate through full gulp reassembly (the capture ->
staging contract).

``--engines N`` scales the fan-out toward the chip's ~4.6-pipeline
compute margin; on a shared-core host the ceiling is the core count
(each engine needs ~1 RX + 1 consumer thread, and each blaster burns a
core), which the JSON reports alongside the rate.

Optionally (--h2d) extends the path with a device upload per gulp to
measure capture -> device feeding; on a tunneled TPU this measures the
tunnel, not production PCIe, and is reported separately.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np


def run_engines(cfg, ports, data, ngulp: int, delay_ns: int,
                dev_put=None, consume_timeout_s: float = 3.0) -> dict:
    """Drive one capture+blaster+consumer trio per port; returns
    aggregate stats.  Loss-free means nmissing == 0 across all engines."""
    from ..io import native

    caps = [native.NativeCapture(cfg, "127.0.0.1", p, nbuf=16)
            for p in ports]
    for c in caps:
        c.start()
    got = [0] * len(ports)

    tx_secs = [0.0] * len(ports)
    tx_npkt = [0] * len(ports)

    def tx(k, port):
        # one native call for the whole stream: a single socket and a
        # single absolute pacing deadline (no per-gulp interpreter
        # round trip), so the offered rate tracks delay_ns closely even
        # with multiple in-process blasters.  Per-port TX timing is
        # recorded so callers can tell a pacing slip (TX threads
        # starved by the host) from a capture-path stall.
        t0 = time.perf_counter()
        tx_npkt[k] = native.transmit_stream(
            "127.0.0.1", port, data, ngulp,
            nchan_per_pkt=64, npol_per_pkt=cfg.ninput,
            delay_ns=delay_ns)
        tx_secs[k] = time.perf_counter() - t0

    def consume(i):
        while got[i] < ngulp:
            seq0, gulp = caps[i].get_gulp(timeout_s=consume_timeout_s)
            if seq0 is None:
                break
            if dev_put is not None:
                dev_put(gulp)
            got[i] += 1

    t0 = time.perf_counter()
    txs = [threading.Thread(target=tx, args=(k, p))
           for k, p in enumerate(ports)]
    rxs = [threading.Thread(target=consume, args=(i,))
           for i in range(len(ports))]
    for t in txs + rxs:
        t.start()
    for t in txs + rxs:
        t.join()
    dt = time.perf_counter() - t0

    stats = [c.stats() for c in caps]
    for c in caps:
        c.close()
    nmissing = sum(s["nmissing"] for s in stats)
    npkt = sum(s["npkt"] for s in stats)
    # rate the blasters ACTUALLY delivered (payload bytes; headers are
    # excluded on both TX and RX sides so the rates compare 1:1)
    payload = 64 * cfg.ninput
    tx_gbps = sum(8 * n * payload / max(s, 1e-9) / 1e9
                  for n, s in zip(tx_npkt, tx_secs))
    return {"dt": dt, "ngot": sum(got), "nmissing": nmissing,
            "npkt": npkt, "per_engine_gulps": got,
            "tx_gbps": tx_gbps}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="ingest benchmark")
    p.add_argument("--ngulp", type=int, default=100)
    p.add_argument("--engines", type=int, default=1,
                   help="parallel capture engines (one port + RX thread "
                        "each; the reference runs 4 per server)")
    p.add_argument("--delay-ns", type=int, default=580_000,
                   help="TX burst pacing per engine; 668000 offers "
                        "~25.9 Gb/s (the reference real-time bar) at the "
                        "production packet geometry")
    p.add_argument("--port", type=int, default=19757)
    p.add_argument("--h2d", action="store_true",
                   help="also device_put each gulp (measures the "
                        "device-feeding path; tunnel-bound on axon)")
    p.add_argument("--adc", action="store_true",
                   help="FX-mode wire geometry: int8 ADC frames "
                        "(nchan -> 2*nchan bytes, the AdcCaptureSource "
                        "path) instead of packed 4+4-bit voltages")
    args = p.parse_args(argv)

    from ..config import XEngineConfig

    cfg = XEngineConfig(nstand=352, nchan=192, ntime_gulp=480)
    if args.adc:
        # the capture engine is geometry-parameterized bytes: ADC mode
        # is the same engine with L=2*nchan byte "channels" per frame
        cfg = cfg.replace(nchan=2 * cfg.nchan)
    rng = np.random.RandomState(1)
    data = rng.randint(0, 256, [cfg.ntime_gulp, cfg.nchan, cfg.ninput]) \
        .astype(np.uint8)

    dev_put = None
    if args.h2d:
        import jax
        import jax.numpy as jnp

        def dev_put(g):
            return jax.block_until_ready(jnp.asarray(g))

    ports = [args.port + i for i in range(args.engines)]
    r = run_engines(cfg, ports, data, args.ngulp, args.delay_ns, dev_put)

    total_pkts = max(r["npkt"] + r["nmissing"], 1)
    gbps = 8 * r["ngot"] * data.nbytes / r["dt"] / 1e9
    print(json.dumps({
        "metric": ("ingest_adc_rate" if args.adc else
                   "ingest_h2d_rate" if args.h2d else
                   "ingest_sustained_rate"),
        "value": round(gbps, 2),
        "unit": "Gb/s",
        "vs_baseline": round(gbps / 25.9, 3),
        "engines": args.engines,
        "host_cores": os.cpu_count(),
        "gulps": r["ngot"],
        "loss_fraction": round(r["nmissing"] / total_pkts, 5),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
