"""Per-stage speed-of-light benchmark at the production operating point.

Times each pipeline stage in isolation — fused Pallas PFB (bf16 and
high precision), the windowed correlator, the beamformer + power
integration, baseline subselection, and the slow accumulate — at the
full LWA-352 shape (2400 spectra x 192 chan x 704 inputs, the
reference's fixed operating point, reference: install_xgpu.sh:5), and
compares each against its analytic roofline on the measured chip
(MXU peak and HBM bandwidth), naming the binding resource.

Methodology per stage: compile + settle, measure single-call
dispatch+probe overhead, then chain ``niter`` enqueued calls and fetch a
device-side scalar once (the axon tunnel does not fence on
block_until_ready; in-order device execution makes the final fetch a
barrier for the whole chain).

Prints a JSON document with measured ms, roofline ms, efficiency, and
the binding resource per stage.  Nominal peaks default to TPU v5e
(197 TFLOP/s bf16, 819 GB/s HBM) and can be overridden with
``--tflops/--hbm``.
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


def _time_stage(fn, args, probe, niter: int) -> float:
    """Seconds per call, overhead-subtracted, probe-fenced."""
    def fetch(out):
        return float(np.asarray(jax.device_get(probe(out))))

    out = fn(*args)
    fetch(out)  # compile + settle
    t0 = time.perf_counter()
    fetch(fn(*args))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(niter):
        out = fn(*args)
    fetch(out)
    return max((time.perf_counter() - t0 - overhead) / max(niter - 1, 1),
               1e-9)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="per-stage SOL benchmark")
    p.add_argument("--niter", type=int, default=12)
    p.add_argument("--tflops", type=float, default=197.0,
                   help="chip bf16 MXU peak, TFLOP/s")
    p.add_argument("--hbm", type=float, default=819.0,
                   help="chip HBM bandwidth, GB/s")
    p.add_argument("--vpu-tops", type=float, default=3.85,
                   help="chip VPU peak, Tops/s of f32 lane ops "
                        "(v5e: 4 ALUs x 8x128 lanes x 940 MHz)")
    p.add_argument("--stages", default="",
                   help="comma-separated subset to run")
    p.add_argument("--pfb-chunks", type=int, default=1,
                   help="pipeline_chunks for the fused PFB stages "
                        "(VERDICT r4 #2 VPU/MXU overlap A/B; "
                        "bit-identical)")
    args = p.parse_args(argv)

    from ..config import LWA352
    from ..ops import beamform as bf
    from ..ops import corr_subsel as cs
    from ..ops import correlate as corr
    from ..ops import pfb as pfb_ops
    from ..ops.pallas import pfb_fused

    cfg = LWA352
    T, C, I, B = cfg.acc_len, cfg.nchan, cfg.ninput, cfg.nbeam
    L, ntap = 2 * cfg.nchan, cfg.pfb_ntap
    rng = np.random.RandomState(1)

    packed = jnp.asarray(rng.randint(0, 255, [T, C, I]).astype(np.uint8))
    adc = jnp.asarray((rng.standard_normal([(T + ntap - 1) * L, I]) * 3)
                      .astype(np.float32))
    window = jnp.asarray(pfb_ops.pfb_window(C, ntap))
    g = (rng.standard_normal([C, B, I])
         + 1j * rng.standard_normal([C, B, I])).astype(np.complex64)
    gains = bf.BeamGains.from_complex(g)
    pairs = jnp.asarray(cs.baselines_to_inputs(
        cs.default_baselines(cfg.nvis_out, cfg.nstand)).astype(np.int32))
    vis = corr.Vis(
        jnp.asarray(rng.randint(-1 << 20, 1 << 20, [C, I, I]), jnp.int32),
        jnp.asarray(rng.randint(-1 << 20, 1 << 20, [C, I, I]), jnp.int32))

    GB = 1e9
    # Minimum-traffic / MXU-work models per stage (bytes, flops):
    plane_bf16 = 2 * T * C * I * 2          # two bf16 planes of the window
    vis_bytes = 2 * C * I * I * 4           # two int32 planes
    dft_flops_1pass = T * I * L * L * 2     # real-DFT matmul [L]x[L,L]
    # VPU lane-op model for the fused PFB (the r3 kernel decomposition
    # showed the gap to the two-resource roofline is the VPU FIR +
    # quantize/pack chain, which SERIALIZES with the MXU dots inside a
    # grid instance): FIR = ntap mul + (ntap-1) add per (spec, L,
    # input) sample; requant+pack ~= 12 lane ops per packed byte
    # (2x round/clip/convert + shift/and/or/convert); int8 input adds
    # one whole-slab convert.
    fir_vpu = T * L * I * (2 * ntap - 1)
    quant_vpu = T * C * I * 12
    models = {
        "pfb_fused_bf16": {
            # one HBM pass: f32 ADC in, packed 4-bit out; DFT on MXU
            "hbm": (T + ntap - 1) * L * I * 4 + T * C * I,
            "flops": dft_flops_1pass + T * L * ntap * I * 2,
            "vpu": fir_vpu + quant_vpu,
        },
        "pfb_fused_high": {
            # 3-pass compensated bf16 split = 3x the DFT MXU work
            "hbm": (T + ntap - 1) * L * I * 4 + T * C * I,
            "flops": 3 * dft_flops_1pass + T * L * ntap * I * 2,
            "vpu": fir_vpu + quant_vpu + 4 * T * L * I,  # hi/lo splits
        },
        "pfb_fused_bf16_int8": {
            # int8 ADC input: 4x less HBM read than f32
            "hbm": (T + ntap - 1) * L * I + T * C * I,
            "flops": dft_flops_1pass + T * L * ntap * I * 2,
            "vpu": fir_vpu + quant_vpu + T * L * I,  # slab convert
        },
        "corr_window": {
            # packed in, bf16 planes written+read once, vis out
            "hbm": T * C * I + 2 * plane_bf16 + vis_bytes,
            # 3 matmuls (imag from one product's antisymmetry)
            "flops": 3 * C * I * I * T * 2,
        },
        "beamform_power": {
            # packed in, bf16 planes w+r, beam voltages f32 w+r, powers
            "hbm": (T * C * I + 2 * plane_bf16 + 2 * (2 * C * B * T * 4)
                    + (B // 2) * (T // cfg.ntime_sum) * C * 4 * 4),
            # bf16x2: 8 matmuls [C,B,I]x[T,C,I]
            "flops": 8 * C * B * I * T * 2,
        },
        "subsel": {
            "hbm": (2 * C * cfg.nvis_out * 4 * 4   # gathered rows (4 pol)
                    + 2 * (C // cfg.nchan_sum) * cfg.nvis_out * 4),
            "flops": 0,
        },
        "subsel_pallas": {
            # lane-gather kernel: reads each channel plane into VMEM
            # exactly once — its floor is one cube read, vs take()'s
            # measured ~2.7x of that
            "hbm": (vis_bytes
                    + 2 * (C // cfg.nchan_sum) * cfg.nvis_out * 4),
            "flops": 0,
        },
        "subsel_bands": {
            # 2-D block-compacted slab (production selection: 12
            # row-bands x 1 col-tile inside the 16x2 static budget):
            # extract reads + writes the slab, take reads it back
            "hbm": (3 * (2 * C * 16 * 8 * 2 * 128 * 4)
                    + 2 * (C // cfg.nchan_sum) * cfg.nvis_out * 4),
            "flops": 0,
        },
        "slow_accum": {
            "hbm": 3 * vis_bytes,              # read new + read acc + write
            "flops": 0,
        },
        "corr_blk_acc": {
            # packed in (padded), 6 valid 256-blocks: fast write + slow
            # read + slow write (the fused accumulator algebra)
            "hbm": T * C * 768 + 6 * C * 6 * 256 * 256 * 4 * 2,
            # 3 Karatsuba dots per block pair at bf16-equivalent rate
            "flops": 2 * C * 6 * 256 * 256 * 3 * T,
        },
        "beamform_fused": {
            # packed in + stacked gains; voltages never reach HBM
            "hbm": T * C * 768 + C * 4 * B * 768 * 2,
            "flops": 2 * C * T * 4 * B * 768 * 2,
        },
    }

    def probe_vis(v):
        return jnp.sum(v.real[0, 0, :8]) + jnp.sum(v.imag[0, 1, :8])

    nc = args.pfb_chunks
    stages = {
        "pfb_fused_bf16": (
            jax.jit(lambda a, w: pfb_fused.pfb_quantize_packed_pallas(
                a, w, C, ntap, 0.5, fast=True, pipeline_chunks=nc)),
            (adc, window),
            jax.jit(lambda o: jnp.sum(o.astype(jnp.int32)[0, :8, 0]))),
        "pfb_fused_high": (
            jax.jit(lambda a, w: pfb_fused.pfb_quantize_packed_pallas(
                a, w, C, ntap, 0.5, fast=False, pipeline_chunks=nc)),
            (adc, window),
            jax.jit(lambda o: jnp.sum(o.astype(jnp.int32)[0, :8, 0]))),
        "pfb_fused_bf16_int8": (
            jax.jit(lambda a, w: pfb_fused.pfb_quantize_packed_pallas(
                a, w, C, ntap, 0.5, fast=True, pipeline_chunks=nc)),
            (jnp.asarray(np.clip(np.rint(np.asarray(adc) * 10),
                                 -127, 127).astype(np.int8)), window),
            jax.jit(lambda o: jnp.sum(o.astype(jnp.int32)[0, :8, 0]))),
        "corr_window": (
            jax.jit(lambda pk: corr.correlate_accumulate(pk, T)),
            (packed,),
            jax.jit(probe_vis)),
        "beamform_power": (
            jax.jit(lambda pk, gn: bf.beam_power_sum(
                bf.beamform_gulp(pk, gn), cfg.ntime_sum)),
            (packed, gains),
            jax.jit(lambda o: jnp.sum(o[0, 0, :8, 0]))),
        "subsel": (
            jax.jit(lambda v, pr: cs.corr_subsel(v, pr, cfg.nchan_sum)),
            (vis, pairs),
            jax.jit(lambda v: jnp.sum(v.real[0, :8])
                    + jnp.sum(v.imag[1, :8]))),
        "slow_accum": (
            jax.jit(corr.long_accumulate),
            (vis, vis),
            jax.jit(probe_vis)),
    }

    from ..ops.pallas.subsel_gather import corr_subsel_pallas
    stages["subsel_pallas"] = (
        jax.jit(lambda v, pr: corr_subsel_pallas(v, pr, cfg.nchan_sum)),
        (vis, pairs),
        jax.jit(lambda v: jnp.sum(v.real[0, :8])
                + jnp.sum(v.imag[1, :8])))
    # the committed production engine, at the production selection (all
    # pol pairs among the first 48 stands) on the blk engine's padded
    # accumulator width — the operands the fused step really hands it
    prod_pairs = jnp.asarray(cs.baselines_to_inputs(
        cs.production_baselines(cfg.nvis_out, cfg.nstand, cfg.npol),
        cfg.npol).astype(np.int32))
    from ..ops.pallas.corr_blk import padded_ni as _pni
    nip = _pni(I)
    vis_p = corr.Vis(
        jnp.asarray(rng.randint(-1 << 20, 1 << 20, [C, nip, nip]),
                    jnp.int32),
        jnp.asarray(rng.randint(-1 << 20, 1 << 20, [C, nip, nip]),
                    jnp.int32))
    stages["subsel_bands"] = (
        jax.jit(lambda v, pr: cs.corr_subsel_bands(v, pr,
                                                   cfg.nchan_sum)),
        (vis_p, prod_pairs),
        jax.jit(lambda v: jnp.sum(v.real[0, :8])
                + jnp.sum(v.imag[1, :8])))

    # engine stages (the production bench.py configuration)
    from ..ops.pallas.beamform_fused import (beamform_products_pallas,
                                             stacked_gains)
    from ..ops.pallas.corr_blk import packed_corr_blk_acc, padded_ni

    ni_pad = padded_ni(I)
    vis_pad = corr.Vis(
        jnp.zeros((C, ni_pad, ni_pad), jnp.int32),
        jnp.zeros((C, ni_pad, ni_pad), jnp.int32))
    gstack = stacked_gains(gains, ni_pad)
    stages["corr_blk_acc"] = (
        jax.jit(lambda pk_, sl: packed_corr_blk_acc(
            pk_, None, sl, True, True, False)),
        (packed, vis_pad),
        jax.jit(lambda o: jnp.sum(o[0].real[0, 0, :8])
                + jnp.sum(o[1].real[0, 1, :8])))
    stages["beamform_fused"] = (
        jax.jit(lambda pk_, gs: beamform_products_pallas(
            pk_, gs, cfg.ntime_sum)),
        (packed, gstack),
        jax.jit(lambda o: jnp.sum(o[0][0, 0, :8, 0])
                + jnp.sum(o[1][0, 0, :, 0])))

    only = {s for s in args.stages.split(",") if s}
    rows = []
    for name, (fn, inputs, probe) in stages.items():
        if only and name not in only:
            continue
        dt = _time_stage(fn, inputs, probe, args.niter)
        m = models[name]
        t_mxu = m["flops"] / (args.tflops * 1e12)
        t_hbm = m["hbm"] / (args.hbm * GB)
        t_vpu = m.get("vpu", 0) / (args.vpu_tops * 1e12)
        # within a Pallas grid instance the VPU prologue/epilogue
        # serializes with the MXU dots (Mosaic runs instances in
        # order), so the compute floor is their SUM; DMA overlaps
        t_sol = max(t_mxu + t_vpu, t_hbm)
        binding = ("HBM" if t_hbm >= t_mxu + t_vpu else
                   "MXU+VPU" if t_vpu > 0 else "MXU")
        row = {
            "stage": name, "measured_ms": round(dt * 1e3, 2),
            "roofline_ms": round(t_sol * 1e3, 2),
            "mxu_ms": round(t_mxu * 1e3, 2),
            "hbm_ms": round(t_hbm * 1e3, 2),
            "binding": binding,
            "sol_fraction": round(t_sol / dt, 3) if dt else 0.0,
        }
        if t_vpu:
            row["vpu_ms"] = round(t_vpu * 1e3, 2)
        rows.append(row)
        print(f"{name}: {dt*1e3:.2f} ms measured, "
              f"SOL {t_sol*1e3:.2f} ms ({rows[-1]['binding']}-bound, "
              f"{rows[-1]['sol_fraction']*100:.0f}% of SOL)",
              file=sys.stderr)

    print(json.dumps({
        "metric": "stage_speed_of_light",
        "shape": {"nspec": T, "nchan": C, "ninput": I, "nbeam": B},
        "peaks": {"bf16_tflops": args.tflops, "hbm_gbps": args.hbm},
        "platform": jax.devices()[0].device_kind,
        "stages": rows}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
