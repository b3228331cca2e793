"""Benchmark: fused X-engine at the full LWA-352 operating point.

Measures the production operating mode: ONE device call per fast
accumulation (2400 spectra = ~100.3 ms of sky time), fusing correlate
(MXU-internal accumulation over the whole window) + slow accumulate +
subselect + 32-beam beamform + power integration + VLBI downselect.
Throughput is expressed as the equivalent 4+4-bit input rate in Gb/s.

The baseline is the reference's de-facto real-time requirement: one
pipeline keeps up with ~25.9 Gb/s of input (192 chan x 704 inputs x
23.926 kHz x 1 B) on an RTX 2080Ti (BASELINE.md).  ``vs_baseline`` is the
achieved rate over that bar (1.0 == real time; higher is better).

Methodology: calls are chained through the carried accumulator state and
a scalar probe of the final state is fetched through a jitted reducer, so
asynchronous dispatch cannot under-report; single-call dispatch overhead
is measured and subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent compile cache: tunnel compiles take minutes
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

BASELINE_GBPS = 25.9  # reference real-time requirement (BASELINE.md)


def main():
    from caltech_bifrost_dsp_tpu.config import LWA352_TPU
    from caltech_bifrost_dsp_tpu.models import xengine

    # The committed production engine selection (config.TPU_ENGINES —
    # ONE source of truth shared with the pipeline CLI's auto
    # defaults): 256-block int8 Karatsuba correlator with fused
    # accumulator algebra + fused beamform/power kernel + 2-D
    # block-compacted subselection (ops/pallas/corr_blk.py,
    # beamform_fused.py, subsel_gather.py).  CBD_BENCH_SUBSEL
    # overrides the subselection engine for A/B measurement.
    import os as _os

    cfg = LWA352_TPU
    if _os.environ.get("CBD_BENCH_SUBSEL"):
        cfg = cfg.replace(subsel_engine=_os.environ["CBD_BENCH_SUBSEL"])
    state, _, gains, pairs = xengine.default_inputs(cfg)
    # prestack the beamformer gain operand once (the driver does the
    # same at gain-load time)
    from caltech_bifrost_dsp_tpu.ops.pallas.beamform_fused import \
        stacked_gains

    gains = stacked_gains(gains, xengine.bf_operand_ni(cfg))
    rng = np.random.RandomState(1)
    # chan-major 256-padded staging ("cti"): the layout the capture
    # engine lands gulps in for the TPU path — both Pallas engines read
    # it directly, skipping the ~2.3 ms/window pad+transpose prologue
    # the wire order costs (pad lanes are DON'T-CARE bytes)
    ni_pad = xengine.bf_operand_ni(cfg)
    block_np = np.zeros((cfg.nchan, cfg.acc_len, ni_pad), np.uint8)
    block_np[:, :, :cfg.ninput] = rng.randint(
        0, 255, [cfg.acc_len, cfg.nchan, cfg.ninput]).astype(
            np.uint8).transpose(1, 0, 2)
    block = jnp.asarray(block_np)

    # NB: no donate_argnums — donated outputs cannot be fed to another
    # program on the axon tunnel backend (INVALID_ARGUMENT).
    @jax.jit
    def acc_step(state, packed, gains, pairs):
        # one full fast accumulation + dump products per call; static
        # boundary flags let XLA fold the accumulator selects
        return xengine.xengine_step(state, packed, gains, pairs,
                                    True, True, False, cfg,
                                    layout="cti")

    probe = jax.jit(
        lambda st: jnp.sum(st.vis_slow.real[0, 0, :8])
        + jnp.sum(st.vis_fast.real[0, 0, :8]))

    def fetch(st):
        # host transfer forces completion (block_until_ready does not
        # wait on the axon tunnel)
        return float(np.asarray(jax.device_get(probe(st))))

    # Warm up / compile.
    state, out = acc_step(state, block, gains, pairs)
    fetch(state)

    # Single-call dispatch+probe overhead.
    t0 = time.perf_counter()
    state, out = acc_step(state, block, gains, pairs)
    fetch(state)
    overhead = time.perf_counter() - t0

    k = 20
    t0 = time.perf_counter()
    for _ in range(k):
        state, out = acc_step(state, block, gains, pairs)
    fetch(state)
    elapsed = time.perf_counter() - t0

    per_call = max((elapsed - overhead) / (k - 1), 1e-9)
    gbps = 8 * cfg.acc_len * cfg.nchan * cfg.ninput / per_call / 1e9
    print(json.dumps({
        "metric": "xengine_sustained_input_rate",
        "value": round(gbps, 3),
        "unit": "Gb/s",
        "vs_baseline": round(gbps / BASELINE_GBPS, 3),
    }))


if __name__ == "__main__":
    main()
