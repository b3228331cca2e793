"""Whole-pipeline throughput benchmark (host threads + H2D + device).

Runs the real threaded driver (ingest -> fused step -> outputs) with an
unthrottled synthetic source and measures end-to-end sustained Gb/s of
4+4-bit input — the closest analog of the reference's
``DummySource(skip_write=True, target_throughput=...)`` downstream
benchmark (reference: dummy_source_block.py:130-140).

Unlike bench.py (pure device throughput), this includes gulp generation,
staging-ring hops, host->device upload and product fetches.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="pipeline throughput bench")
    p.add_argument("--seconds", type=float, default=20.0,
                   help="approximate measurement duration")
    p.add_argument("--nstand", type=int, default=352)
    p.add_argument("--nchan", type=int, default=192)
    p.add_argument("--skip-write", action="store_true",
                   help="zero-filled gulps (no generation cost)")
    args = p.parse_args(argv)

    from ..config import LWA352
    from ..io import source
    from ..runtime.driver import XEnginePipeline

    cfg = LWA352.replace(nstand=args.nstand, nchan=args.nchan)
    src = source.DummySource(cfg, mode="ramp",
                             skip_write=args.skip_write,
                             target_throughput_gbps=1000.0)
    pipe = XEnginePipeline(cfg, src)

    # Warm up compile with a short run, then measure a longer one.
    pipe.run(2 * cfg.acc_len // cfg.ntime_gulp, timeout_s=1800)

    est_gulps = max(
        int(args.seconds / (cfg.gulp_nbyte * 8 / 25.9e9)),
        4 * cfg.acc_len // cfg.ntime_gulp)
    src2 = source.DummySource(cfg, mode="ramp",
                              skip_write=args.skip_write,
                              target_throughput_gbps=1000.0)
    pipe2 = XEnginePipeline(cfg, src2)
    pipe2.state = pipe.state  # reuse warmed buffers/layouts
    t0 = time.perf_counter()
    pipe2.run(est_gulps, timeout_s=1800)
    elapsed = time.perf_counter() - t0
    nbit = est_gulps * cfg.gulp_nbyte * 8
    gbps = nbit / elapsed / 1e9
    print(json.dumps({
        "metric": "pipeline_end_to_end_rate",
        "value": round(gbps, 3),
        "unit": "Gb/s",
        "vs_baseline": round(gbps / 25.9, 3),
        "gulps": est_gulps,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
