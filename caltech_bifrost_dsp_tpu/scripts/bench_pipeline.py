"""Whole-pipeline throughput benchmark (host threads + H2D + device).

Runs the real threaded driver (ingest -> fused step -> outputs) with an
unthrottled synthetic source and measures end-to-end sustained Gb/s of
4+4-bit input — the closest analog of the reference's
``DummySource(skip_write=True, target_throughput=...)`` downstream
benchmark (reference: dummy_source_block.py:130-140).

Unlike bench.py (pure device throughput), this includes gulp generation,
staging-ring hops, host->device upload and product fetches.

``--stub-device MS`` replaces the device call with a sleep of MS
milliseconds per fast window (the measured device time; bench.py reports
~33 ms against the 100.3 ms budget) and zero products: the HOST half of
the architecture — capture -> staging ring -> compute thread -> output
thread — is then measured in one process at full rate, independent of
the tunnel-bound H2D link of this environment (production PCIe runs at
tens of GB/s against the 3.2 GB/s/pipeline budget).  Combine with
``--udp`` to drive the native C++ capture engine over loopback with the
paced native blaster (capture included), or without it to use the
in-process synthetic source (staging/compute/output only).  The JSON
reports the compute thread's acquire/reserve/process split — the
reference's perf taxonomy (corr_block.py:453-457) — where acquire ~
waiting for input and reserve/process < budget proves no starvation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="pipeline throughput bench")
    p.add_argument("--seconds", type=float, default=20.0,
                   help="approximate measurement duration")
    p.add_argument("--nstand", type=int, default=352)
    p.add_argument("--nchan", type=int, default=192)
    p.add_argument("--skip-write", action="store_true",
                   help="zero-filled gulps (no generation cost)")
    p.add_argument("--stub-device", type=float, default=None,
                   metavar="MS", help="replace the device call with a "
                   "MS-per-window sleep (host-side real-time proof)")
    p.add_argument("--udp", action="store_true",
                   help="with --stub-device: ingest via the native C++ "
                        "capture engine over loopback (paced blaster)")
    p.add_argument("--fx", action="store_true",
                   help="with --udp: FX mode — int8 ADC frames through "
                        "AdcCaptureSource and the zero-copy staging "
                        "path; the wire carries 2x the packed-voltage "
                        "bytes for the same sky time, so vs_baseline "
                        "is against the 51.8 Gb/s ADC wire budget "
                        "(docs/performance.md Ingest)")
    p.add_argument("--delay-ns", type=int, default=580_000,
                   help="blaster pacing for --udp (580000 ~ 29 Gb/s)")
    p.add_argument("--port", type=int, default=19791)
    args = p.parse_args(argv)

    if args.stub_device is not None:
        # host-only measurement: keep JAX off the (tunnel) accelerator
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
        if args.stub_device is not None:
            jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import numpy as np

    from ..config import LWA352
    from ..io import source
    from ..runtime.driver import XEnginePipeline

    cfg = LWA352.replace(nstand=args.nstand, nchan=args.nchan)
    if args.fx:
        if not args.udp:
            p.error("--fx requires --udp")
        cfg = cfg.replace(adc_dtype="int8")

    tx_threads: list[threading.Thread] = []
    cap = None
    if args.udp:
        if args.stub_device is None:
            p.error("--udp requires --stub-device")
        from ..io import native

        cap = (native.AdcCaptureSource(cfg, "127.0.0.1", args.port,
                                       nbuf=16)
               if args.fx else
               native.CaptureSource(cfg, "127.0.0.1", args.port,
                                    nbuf=16))
        src = cap
    else:
        src = source.DummySource(cfg, mode="ramp",
                                 skip_write=args.skip_write,
                                 target_throughput_gbps=1000.0)

    pipe = XEnginePipeline(cfg, src, stub_device_ms=args.stub_device,
                           fx_mode=args.fx)

    est_gulps = max(
        int(args.seconds / (cfg.gulp_nbyte * 8 / 25.9e9)),
        4 * cfg.acc_len // cfg.ntime_gulp)
    # round to whole fast windows so the run ends on a dump
    gpa = cfg.acc_len // cfg.ntime_gulp
    est_gulps = (est_gulps // gpa) * gpa

    if args.udp:
        rng = np.random.RandomState(1)
        # FX wire: one snap2 "time" = one spectrum frame of 2*nchan
        # int8 samples per input (io/native.py AdcCaptureSource)
        nchan_wire = 2 * cfg.nchan if args.fx else cfg.nchan
        data = rng.randint(0, 256, [cfg.ntime_gulp, nchan_wire,
                                    cfg.ninput]).astype(np.uint8)

        def tx():
            from ..io import native as _native

            for g in range(est_gulps + 2):
                _native.transmit_gulp(
                    "127.0.0.1", args.port, data,
                    seq0=g * cfg.ntime_gulp, nchan_per_pkt=64,
                    npol_per_pkt=cfg.ninput, delay_ns=args.delay_ns)

        tx_threads.append(threading.Thread(target=tx))
    elif args.stub_device is None:
        # device path: warm up compile with a short run first
        pipe.run(2 * cfg.acc_len // cfg.ntime_gulp, timeout_s=1800)
        src2 = source.DummySource(cfg, mode="ramp",
                                  skip_write=args.skip_write,
                                  target_throughput_gbps=1000.0)
        pipe2 = XEnginePipeline(cfg, src2)
        pipe2.state = pipe.state  # reuse warmed buffers/layouts
        pipe = pipe2

    # FX wire carries 2x the packed bytes for the same sky time, so
    # its real-time bar is 2x the 25.9 Gb/s packed-voltage bar
    wire_gulp_nbyte = (2 * cfg.gulp_nbyte if args.fx
                       else cfg.gulp_nbyte)
    bar = 2 * 25.9 if args.fx else 25.9

    t0 = time.perf_counter()
    for t in tx_threads:
        t.start()
    # a UDP run where the capture drops a whole gulp can never deliver
    # est_gulps to the driver — bound the wait by the expected duration
    # (pessimistic 15 Gb/s) and report the partial run honestly instead
    # of hanging
    expect_s = est_gulps * wire_gulp_nbyte * 8 / 15e9
    ngot = est_gulps
    partial = False
    try:
        pipe.run(est_gulps, timeout_s=max(120.0, 3 * expect_s))
    except TimeoutError:
        partial = True
        pipe.shutdown()
        if cap is not None:
            st = cap.stats()
            pkts_per_gulp = max(data.nbytes // (64 * cfg.ninput), 1)
            ngot = min(est_gulps, st["npkt"] // pkts_per_gulp)
    elapsed = time.perf_counter() - t0
    for t in tx_threads:
        t.join()

    nbit = ngot * wire_gulp_nbyte * 8
    gbps = nbit / elapsed / 1e9
    perf = pipe.perf_compute
    result = {
        "metric": ("pipeline_fx_host_rate_stub_device" if args.fx
                   else "pipeline_host_rate_stub_device"
                   if args.stub_device is not None
                   else "pipeline_end_to_end_rate"),
        "value": round(gbps, 3),
        "unit": "Gb/s",
        "vs_baseline": round(gbps / bar, 3),
        "gulps": ngot,
        "partial": partial,
        "compute_thread": {
            "acquire_s": round(perf.acquire_time, 3),
            "reserve_s": round(perf.reserve_time, 3),
            "process_s": round(perf.process_time, 3),
        },
    }
    if args.stub_device is not None:
        result["stub_device_ms_per_window"] = args.stub_device
    if cap is not None:
        st = cap.stats()
        total = max(st["npkt"] + st["nmissing"], 1)
        result["capture"] = {
            "npkt": st["npkt"], "nmissing": st["nmissing"],
            "loss_fraction": round(st["nmissing"] / total, 6)}
        cap.close()
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
