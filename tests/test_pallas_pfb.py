"""Fused Pallas channelizer kernel (interpret mode): bitwise agreement
with the XLA input-major PFB path at both the direct-DFT pipeline scale
and the factored-DFT F-engine scale."""

import jax.numpy as jnp
import numpy as np

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


def test_fused_kernel_factored_fengine_scale(rng):
    """4096-channel factored-DFT variant (the F-engine operating
    point), exact vs the XLA factored path."""
    nchan, ntap, nspec, ninput = 4096, 4, 8, 2
    L = 2 * nchan
    assert pfb._dft_factors(L) is not None
    x = (rng.standard_normal([(nspec + ntap - 1) * L, ninput]) * 3) \
        .astype(np.float32)
    w = pfb.pfb_window(nchan, ntap)
    got = np.asarray(pfb_quantize_packed_pallas(
        jnp.asarray(x), jnp.asarray(w), nchan, ntap, 0.5,
        interpret=True))
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
