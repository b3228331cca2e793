"""Benchmark: fused X-engine step at the full LWA-352 operating point.

Measures sustained throughput of the flagship fused step (correlate +
fast/slow accumulate + subsel + 32-beam beamform + power integration +
VLBI downselect) on one chip, expressed as the equivalent 4+4-bit input
rate in Gb/s.

The baseline is the reference's de-facto real-time requirement: one
pipeline keeps up with ~25.9 Gb/s of input (192 chan x 704 inputs x
23.926 kHz x 1 B) on an RTX 2080Ti (BASELINE.md).  ``vs_baseline`` is the
achieved rate over that bar (1.0 == real time; higher is better).

Methodology: K steps are chained inside one jitted ``fori_loop`` (carrying
the accumulator state) and a scalar of the final state is fetched to the
host, so asynchronous dispatch cannot under-report.  Dispatch/transfer
overhead is amortized over K.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_GBPS = 25.9  # reference real-time requirement (BASELINE.md)


def main():
    from caltech_bifrost_dsp_tpu.config import LWA352
    from caltech_bifrost_dsp_tpu.models import xengine

    cfg = LWA352
    state, packed, gains, pairs = xengine.default_inputs(cfg)
    flags = (jnp.bool_(False), jnp.bool_(False), jnp.bool_(False))

    @functools.partial(jax.jit, donate_argnums=(0,), static_argnames="k")
    def run_k(state, packed, gains, pairs, k):
        def body(_, st):
            st, _out = xengine.xengine_step(st, packed, gains, pairs,
                                            *flags, cfg)
            return st

        return jax.lax.fori_loop(0, k, body, state)

    probe = jax.jit(lambda st: jnp.sum(st.vis_fast.real[0, 0, :8]))

    def fetch(st):
        # force completion with a host transfer (the axon tunnel's
        # block_until_ready does not wait for remote execution); raw
        # eager slicing is unsupported on this backend, so probe via jit
        return float(np.asarray(jax.device_get(probe(st))))

    # Warm up / compile both k variants.
    state = run_k(state, packed, gains, pairs, 1)
    fetch(state)
    k = 30
    state = run_k(state, packed, gains, pairs, k)
    fetch(state)

    # Overhead of a single-step dispatch+fetch (subtracted per chain).
    t0 = time.perf_counter()
    state = run_k(state, packed, gains, pairs, 1)
    fetch(state)
    overhead = time.perf_counter() - t0

    nchain = 3
    t0 = time.perf_counter()
    for _ in range(nchain):
        state = run_k(state, packed, gains, pairs, k)
        fetch(state)
    elapsed = time.perf_counter() - t0

    step_s = max(elapsed / nchain - overhead, 1e-9) / (k - 1)
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
