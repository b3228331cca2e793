"""Benchmark: fused X-engine step at the full LWA-352 operating point.

Measures sustained throughput of the flagship fused step (correlate +
fast/slow accumulate + subsel + 32-beam beamform + power integration) on
one chip, expressed as the equivalent 4+4-bit input rate in Gb/s.

The baseline is the reference's de-facto real-time requirement: one
pipeline must keep up with ~25.9 Gb/s of input (192 chan x 704 inputs x
23.926 kHz x 1 B) on an RTX 2080Ti (BASELINE.md).  ``vs_baseline`` is the
achieved rate divided by that requirement, i.e. 1.0 == real time, higher
is better.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

BASELINE_GBPS = 25.9  # reference real-time requirement (BASELINE.md)


def main():
    from caltech_bifrost_dsp_tpu.config import LWA352
    from caltech_bifrost_dsp_tpu.models import xengine

    cfg = LWA352
    state, packed, gains, pairs = xengine.default_inputs(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state, packed, gains, pairs, fast_first, fast_last,
             slow_first):
        return xengine.xengine_step(state, packed, gains, pairs,
                                    fast_first, fast_last, slow_first, cfg)

    flags = (jnp.bool_(False), jnp.bool_(False), jnp.bool_(False))

    # Warm up / compile.
    for _ in range(3):
        state, out = step(state, packed, gains, pairs, *flags)
    jax.block_until_ready((state, out))

    # Timed run.
    niter = 30
    t0 = time.perf_counter()
    for _ in range(niter):
        state, out = step(state, packed, gains, pairs, *flags)
    jax.block_until_ready((state, out))
    elapsed = time.perf_counter() - t0

    step_s = elapsed / niter
    gulp_bits = 8 * cfg.gulp_nbyte
    gbps = gulp_bits / step_s / 1e9
    print(json.dumps({
        "metric": "xengine_sustained_input_rate",
        "value": round(gbps, 3),
        "unit": "Gb/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
    }))


if __name__ == "__main__":
    main()
