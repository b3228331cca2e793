"""Fused Pallas channelizer kernel (interpret mode): bitwise agreement
with the XLA input-major PFB path at both the direct-DFT pipeline scale
and the factored-DFT F-engine scale."""

import jax.numpy as jnp
import numpy as np
import pytest

from caltech_bifrost_dsp_tpu.ops import pfb
from caltech_bifrost_dsp_tpu.ops.pallas.pfb_fused import (
    pfb_quantize_packed_pallas, tiling_viable)


def _want(x, w, nchan, ntap, scale):
    re, im = pfb.pfb_channelize_planes_imajor(jnp.asarray(x),
                                              jnp.asarray(w), nchan, ntap)
    return np.asarray(pfb.quantize_pack_imajor(re, im, scale))


def test_fused_kernel_direct_scale_exact(rng):
    nchan, ntap, nspec, ninput = 192, 4, 48, 16
    L = 2 * nchan
    x = (rng.standard_normal([(nspec + ntap - 1) * L, ninput]) * 3) \
        .astype(np.float32)
    w = pfb.pfb_window(nchan, ntap)
    assert tiling_viable(nspec, ninput)
    got = np.asarray(pfb_quantize_packed_pallas(
        jnp.asarray(x), jnp.asarray(w), nchan, ntap, 0.5,
        interpret=True))
    np.testing.assert_array_equal(got, _want(x, w, nchan, ntap, 0.5))


@pytest.mark.parametrize("fir_impl", ["frames", "flat"])
@pytest.mark.parametrize("dtype", [np.float32, np.int8])
def test_fused_kernel_pipeline_chunks_bit_identical(rng, fir_impl, dtype):
    """The explicitly software-pipelined schedule (pipeline_chunks > 1,
    the VERDICT r4 #2 VPU/MXU overlap A/B) is pure instruction
    reordering: row-chunked FIR/DFT/quantize must be bit-identical to
    the straight-line kernel for every fir_impl and input dtype."""
    nchan, ntap, nspec, ninput = 64, 4, 48, 8
    L = 2 * nchan
    x = (rng.standard_normal([(nspec + ntap - 1) * L, ninput]) * 3) \
        .astype(np.float32)
    if dtype == np.int8:
        x = np.clip(np.rint(x * 8), -127, 127).astype(np.int8)
    w = pfb.pfb_window(nchan, ntap)
    base = np.asarray(pfb_quantize_packed_pallas(
        jnp.asarray(x), jnp.asarray(w), nchan, ntap, 0.5, fast=True,
        fir_impl=fir_impl, interpret=True))
    for nc in (2, 3, 4):
        got = np.asarray(pfb_quantize_packed_pallas(
            jnp.asarray(x), jnp.asarray(w), nchan, ntap, 0.5, fast=True,
            fir_impl=fir_impl, pipeline_chunks=nc, interpret=True))
        np.testing.assert_array_equal(got, base)
    with pytest.raises(ValueError, match="pipeline_chunks"):
        pfb_quantize_packed_pallas(
            jnp.asarray(x), jnp.asarray(w), nchan, ntap, 0.5,
            pipeline_chunks=7, interpret=True)


def test_fused_kernel_per_channel_scale(rng):
    nchan, ntap, nspec, ninput = 64, 4, 16, 8
    L = 2 * nchan
    x = (rng.standard_normal([(nspec + ntap - 1) * L, ninput]) * 3) \
        .astype(np.float32)
    w = pfb.pfb_window(nchan, ntap)
    sc = rng.uniform(0.3, 0.7, nchan).astype(np.float32)
    got = np.asarray(pfb_quantize_packed_pallas(
        jnp.asarray(x), jnp.asarray(w), nchan, ntap, jnp.asarray(sc),
        interpret=True))
    np.testing.assert_array_equal(got, _want(x, w, nchan, ntap, sc))


@pytest.mark.parametrize("paired", [False, True])
def test_fused_kernel_factored_fengine_scale(rng, paired):
    """4096-channel factored-DFT variant (the F-engine operating
    point), exact vs the XLA factored path — in both the paired
    (side-by-side cos|sin tables) and unpaired matmul layouts."""
    nchan, ntap, nspec, ninput = 4096, 4, 8, 2
    L = 2 * nchan
    assert pfb._dft_factors(L) is not None
    x = (rng.standard_normal([(nspec + ntap - 1) * L, ninput]) * 3) \
        .astype(np.float32)
    w = pfb.pfb_window(nchan, ntap)
    got = np.asarray(pfb_quantize_packed_pallas(
        jnp.asarray(x), jnp.asarray(w), nchan, ntap, 0.5,
        paired=paired, interpret=True))
    np.testing.assert_array_equal(got, _want(x, w, nchan, ntap, 0.5))


def test_channelize_dispatch_falls_back_on_unviable_factored_tiling(rng):
    """A spectra count with no ts<=8 divisor at F-engine scale must fall
    back to the XLA path instead of raising at trace time."""
    from types import SimpleNamespace

    nchan, ntap, nspec, ninput = 4096, 4, 9, 2   # 9 has no mult-of-8 tile
    L = 2 * nchan
    assert not tiling_viable(nspec, ninput, nchan)
    x = (rng.standard_normal([(nspec + ntap - 1) * L, ninput]) * 3) \
        .astype(np.float32)
    w = pfb.pfb_window(nchan, ntap)
    cfg = SimpleNamespace(nchan=nchan, pfb_ntap=ntap,
                          pfb_engine="pallas", pfb_precision="high")
    got = np.asarray(pfb.channelize_pack_imajor(
        jnp.asarray(x), jnp.asarray(w), cfg, 0.5))
    np.testing.assert_array_equal(got, _want(x, w, nchan, ntap, 0.5))


def test_fused_kernel_int8_matches_f32(rng):
    """int8 ADC input (the production digitizer width) is bit-identical
    to feeding the same values as f32, in both DFT precisions and with
    a per-channel scale, and under the int8 tile policy (ti=32)."""
    nchan, ntap, nspec, ninput = 192, 4, 48, 64
    L = 2 * nchan
    x8 = rng.randint(-100, 100,
                     [(nspec + ntap - 1) * L, ninput]).astype(np.int8)
    w = pfb.pfb_window(nchan, ntap)
    sc = rng.uniform(0.02, 0.05, nchan).astype(np.float32)
    got_high = None
    for fast in (False, True):
        got8 = np.asarray(pfb_quantize_packed_pallas(
            jnp.asarray(x8), jnp.asarray(w), nchan, ntap,
            jnp.asarray(sc), fast=fast, interpret=True))
        got32 = np.asarray(pfb_quantize_packed_pallas(
            jnp.asarray(x8, jnp.float32), jnp.asarray(w), nchan, ntap,
            jnp.asarray(sc), fast=fast, interpret=True))
        np.testing.assert_array_equal(got8, got32)
        if not fast:
            got_high = got8
    np.testing.assert_array_equal(
        got_high, _want(x8.astype(np.float32), w, nchan, ntap, sc))


def test_fused_kernel_int8_factored_fengine(rng):
    """int8 input through the factored F-engine-scale branch is
    bit-identical to the same values fed as f32 (vs the XLA path a
    rare off-by-one-quant-step round-at-threshold difference is
    expected between the two HIGH-precision summation orders, so the
    cross-engine check lives in the f32 factored test above)."""
    nchan, ntap, nspec, ninput = 4096, 4, 8, 2
    L = 2 * nchan
    x8 = rng.randint(-100, 100,
                     [(nspec + ntap - 1) * L, ninput]).astype(np.int8)
    w = pfb.pfb_window(nchan, ntap)
    got8 = np.asarray(pfb_quantize_packed_pallas(
        jnp.asarray(x8), jnp.asarray(w), nchan, ntap, 0.5,
        interpret=True))
    got32 = np.asarray(pfb_quantize_packed_pallas(
        jnp.asarray(x8, jnp.float32), jnp.asarray(w), nchan, ntap, 0.5,
        interpret=True))
    np.testing.assert_array_equal(got8, got32)


def test_xla_paths_int8_matches_f32(rng):
    """The XLA channelizer paths accept int8 ADC with exact results."""
    nchan, ntap, nspec, ninput = 16, 4, 12, 6
    L = 2 * nchan
    x8 = rng.randint(-100, 100,
                     [(nspec + ntap - 1) * L, ninput]).astype(np.int8)
    w = jnp.asarray(pfb.pfb_window(nchan, ntap))
    r8, i8 = pfb.pfb_channelize_planes_imajor(jnp.asarray(x8), w,
                                              nchan, ntap)
    r32, i32 = pfb.pfb_channelize_planes_imajor(
        jnp.asarray(x8, jnp.float32), w, nchan, ntap)
    np.testing.assert_array_equal(np.asarray(r8), np.asarray(r32))
    np.testing.assert_array_equal(np.asarray(i8), np.asarray(i32))
    s8 = pfb.pfb_channelize(jnp.asarray(x8), w, nchan, ntap,
                            fft_impl="matmul")
    s32 = pfb.pfb_channelize(jnp.asarray(x8, jnp.float32), w, nchan,
                             ntap, fft_impl="matmul")
    np.testing.assert_array_equal(np.asarray(s8), np.asarray(s32))


def test_explicit_ts_must_divide_nspec():
    """An explicitly passed spectra tile that does not divide nspec
    must be rejected (regression: n_s = nspec // ts truncated and the
    trailing spectra came back uninitialized)."""
    import pytest

    from caltech_bifrost_dsp_tpu.ops.pallas import pfb_fused

    nchan, ntap, ninput = 16, 4, 8
    nspec = 12
    ntime = (nspec + ntap - 1) * 2 * nchan
    x = np.zeros((ntime, ninput), np.float32)
    win = pfb.pfb_window(nchan, ntap)
    with pytest.raises(ValueError):
        pfb_fused.pfb_quantize_packed_pallas(x, win, nchan, ntap, 1.0,
                                             ts=5, interpret=True)
