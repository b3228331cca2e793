"""Single-chip FX benchmark: raw ADC -> PFB -> 4-bit requant -> full
X-engine (the BASELINE.json north-star configuration, which includes the
channelization stage the reference delegates to FPGAs).

Prints one JSON line with the sustained ADC input rate in Msamples/s per
input and the equivalent aggregate rate.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def _gen_adc(nadc: int, ninput: int, adc_dtype: str) -> np.ndarray:
    """Synthetic ADC block, generated at its final dtype.

    At F-engine scale the block is tens of GB; a float64 intermediate
    (RandomState.standard_normal's only output dtype) would be 8x the
    int8 payload and OOM the host, so draw directly at width."""
    rng = np.random.default_rng(0)
    if adc_dtype == "int8":
        return rng.integers(-90, 91, [nadc, ninput], dtype=np.int8)
    return rng.standard_normal([nadc, ninput], dtype=np.float32) * 3


def bench_fengine(args) -> int:
    """F-engine-scale channelization: 4096-channel critically-sampled
    PFB + 4-bit requant across all 704 array inputs.  The real-time bar
    per input is fs = 196 MHz of ADC samples (the FPGA F-engine's job,
    SURVEY.md section 0)."""
    from ..config import LWA352
    from ..ops import pfb as pfb_ops

    nchan, ntap, ninput = args.nchan, LWA352.pfb_ntap, LWA352.ninput
    nspec = args.nspec
    L = 2 * nchan
    nadc = (nspec + ntap - 1) * L
    adc = jnp.asarray(_gen_adc(nadc, ninput, args.adc_dtype))
    window = jnp.asarray(pfb_ops.pfb_window(nchan, ntap))

    if args.fft_impl == "matmul":
        from types import SimpleNamespace

        # channelize_pack_imajor only consults the pfb fields
        cfg = SimpleNamespace(nchan=nchan, pfb_ntap=ntap,
                              pfb_engine=args.pfb_engine,
                              pfb_precision=args.pfb_precision)

        @jax.jit
        def step(adc, window):
            pk = pfb_ops.channelize_pack_imajor(adc, window, cfg, 0.5)
            return jnp.transpose(pk, (1, 2, 0))
    else:
        @jax.jit
        def step(adc, window):
            spec = pfb_ops.pfb_channelize(adc, window, nchan, ntap,
                                          fft_impl=args.fft_impl)
            return pfb_ops.quantize_4bit(spec, 0.5)

    probe = jax.jit(lambda p: jnp.sum(p.astype(jnp.int32)[0, :8, 0]))

    def fetch(p):
        return int(np.asarray(jax.device_get(probe(p))))

    out = step(adc, window)
    fetch(out)
    t0 = time.perf_counter()
    fetch(step(adc, window))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.niter):
        out = step(adc, window)
    fetch(out)
    per_call = max((time.perf_counter() - t0 - overhead)
                   / max(args.niter - 1, 1), 1e-9)

    adc_samples = nspec * L  # per input
    msps_per_input = adc_samples / per_call / 1e6
    realtime_msps = LWA352.fs_hz / 1e6  # full-rate F-engine bar
    print(json.dumps({
        "metric": "fengine_pfb_adc_rate_per_input",
        "value": round(msps_per_input, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps_per_input / realtime_msps, 3),
        "nchan": nchan, "ntap": ntap, "ninput": ninput,
        "aggregate_gsps": round(msps_per_input * ninput / 1e3, 2),
    }))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="FX single-chip benchmark")
    p.add_argument("--nspec", type=int, default=2400,
                   help="spectra per device call (one fast accumulation)")
    p.add_argument("--niter", type=int, default=10,
                   help="measurement iterations (>= 2: one call's "
                        "dispatch overhead is subtracted)")
    p.add_argument("--fft-impl", type=str, default="matmul",
                   choices=["fft", "matmul"],
                   help="matmul by default: the axon AOT helper rejects "
                        "the FFT lowering")
    p.add_argument("--pfb-precision", type=str, default="high",
                   choices=["high", "bf16"])
    p.add_argument("--pfb-engine", type=str, default="xla",
                   choices=["xla", "pallas"])
    p.add_argument("--adc-dtype", type=str, default="float32",
                   choices=["float32", "int8"],
                   help="raw ADC dtype (int8 = production digitizer "
                        "width: 4x less H2D/staging/halo traffic)")
    p.add_argument("--corr-engine", type=str, default="xla",
                   choices=["xla", "pallas_triu", "pallas_blk"])
    p.add_argument("--bf-engine", type=str, default="xla",
                   choices=["xla", "pallas"])
    p.add_argument("--fengine", action="store_true",
                   help="benchmark the F-engine operating point instead: "
                        "4096-channel PFB + 4-bit requant over all 704 "
                        "inputs (channelization only; the north-star "
                        "contract boundary, SURVEY.md section 0)")
    p.add_argument("--nchan", type=int, default=4096,
                   help="F-engine channel count (with --fengine)")
    args = p.parse_args(argv)
    if args.fengine:
        return bench_fengine(args)

    from ..config import LWA352
    from ..models import xengine
    from ..ops import pfb as pfb_ops

    cfg = LWA352.replace(pfb_fft_impl=args.fft_impl,
                         pfb_precision=args.pfb_precision,
                         pfb_engine=args.pfb_engine,
                         adc_dtype=args.adc_dtype,
                         corr_engine=args.corr_engine,
                         bf_engine=args.bf_engine)
    state, _, gains, pairs = xengine.default_inputs(cfg)
    nadc = (args.nspec + cfg.pfb_ntap - 1) * 2 * cfg.nchan
    adc = jnp.asarray(_gen_adc(nadc, cfg.ninput, args.adc_dtype))
    window = jnp.asarray(pfb_ops.pfb_window(cfg.nchan, cfg.pfb_ntap))

    if cfg.bf_engine == "pallas":
        # prestack the gain operand once, as the driver does at
        # gain-load time (and as bench.py measures)
        from ..ops.pallas.beamform_fused import stacked_gains

        gains = stacked_gains(gains, xengine.bf_operand_ni(cfg))

    @jax.jit
    def step(state, adc, window, gains, pairs):
        # chan-major (cti) staging: the corner-turn out of the PFB's
        # input-major layout picks it for free, and both Pallas X/B
        # engines read it directly (see bench.py)
        return xengine.fx_step(state, adc, window, jnp.float32(0.5),
                               gains, pairs, True, True, False, cfg,
                               layout="cti")

    probe = jax.jit(lambda st: jnp.sum(st.vis_fast.real[0, 0, :8]))

    def fetch(st):
        return float(np.asarray(jax.device_get(probe(st))))

    state, out = step(state, adc, window, gains, pairs)
    fetch(state)
    t0 = time.perf_counter()
    state, out = step(state, adc, window, gains, pairs)
    fetch(state)
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.niter):
        state, out = step(state, adc, window, gains, pairs)
    fetch(state)
    per_call = max((time.perf_counter() - t0 - overhead)
                   / max(args.niter - 1, 1), 1e-9)

    adc_samples = args.nspec * 2 * cfg.nchan  # per input
    msps_per_input = adc_samples / per_call / 1e6
    sky_seconds = adc_samples / cfg.fs_hz * (cfg.npipeline)
    # real-time bar: fs/npipeline ADC samples/s per input reach this
    # pipeline's 192 channels
    realtime_msps = cfg.fs_hz / cfg.npipeline / 1e6
    print(json.dumps({
        "metric": "fx_adc_rate_per_input",
        "value": round(msps_per_input, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps_per_input / realtime_msps, 3),
        "aggregate_gsps": round(msps_per_input * cfg.ninput / 1e3, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
