"""Ingest benchmark: sustained capture -> gulp-assembly rate at the
production operating point, against the reference's real-time bar.

The reference sustains 25.9 Gb/s/pipeline with IB-Verbs kernel bypass
(reference: pipeline/lwa352_pipeline/blocks/capture_block.py:180-189).
This bench drives the native C++ capture engine (recvmmsg + bitmap
hole-zeroing + forced-deep kernel buffer) with the native paced blaster
over loopback at the target rate and reports the loss-free sustained
rate through full gulp reassembly (the capture -> staging contract).

Optionally (--h2d) extends the path with a device upload per gulp to
measure capture -> device feeding; on a tunneled TPU this measures the
tunnel, not production PCIe, and is reported separately.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="ingest benchmark")
    p.add_argument("--ngulp", type=int, default=100)
    p.add_argument("--delay-ns", type=int, default=580_000,
                   help="TX burst pacing; 668000 offers ~25.9 Gb/s (the "
                        "reference real-time bar) at the production "
                        "packet geometry")
    p.add_argument("--port", type=int, default=19757)
    p.add_argument("--h2d", action="store_true",
                   help="also device_put each gulp (measures the "
                        "device-feeding path; tunnel-bound on axon)")
    args = p.parse_args(argv)

    from ..config import XEngineConfig
    from ..io import native

    cfg = XEngineConfig(nstand=352, nchan=192, ntime_gulp=480)
    cap = native.NativeCapture(cfg, "127.0.0.1", args.port, nbuf=16)
    cap.start()
    rng = np.random.RandomState(1)
    data = rng.randint(0, 256, [cfg.ntime_gulp, cfg.nchan, cfg.ninput]) \
        .astype(np.uint8)
    ngulp = args.ngulp

    dev_put = None
    if args.h2d:
        import jax
        import jax.numpy as jnp

        def dev_put(g):
            return jax.block_until_ready(jnp.asarray(g))

    def tx():
        for g in range(ngulp):
            native.transmit_gulp(
                "127.0.0.1", args.port, data, seq0=g * cfg.ntime_gulp,
                nchan_per_pkt=64, npol_per_pkt=cfg.ninput,
                delay_ns=args.delay_ns)

    t0 = time.perf_counter()
    th = threading.Thread(target=tx)
    th.start()
    ngot = 0
    while ngot < ngulp:
        seq0, gulp = cap.get_gulp(timeout_s=3.0)
        if seq0 is None:
            break
        if dev_put is not None:
            dev_put(gulp)
        ngot += 1
    th.join()
    dt = time.perf_counter() - t0
    stats = cap.stats()
    cap.close()

    total_pkts = max(stats["npkt"] + stats["nmissing"], 1)
    gbps = 8 * ngot * data.nbytes / dt / 1e9
    print(json.dumps({
        "metric": "ingest_h2d_rate" if args.h2d else
                  "ingest_sustained_rate",
        "value": round(gbps, 2),
        "unit": "Gb/s",
        "vs_baseline": round(gbps / 25.9, 3),
        "gulps": ngot,
        "loss_fraction": round(stats["nmissing"] / total_pkts, 5),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
