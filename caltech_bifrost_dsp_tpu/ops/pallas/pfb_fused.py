"""Pallas TPU kernel: fused PFB FIR + real-DFT + 4-bit requantization.

The XLA PFB pipeline materializes the windowed-FIR intermediate and the
(re, im) spectral planes in HBM (3x the input's footprint of round-trip
traffic); measured on TPU that chain costs ~63 ms of the 100 ms
real-time budget while the correlator+beamformer need only ~8 ms.  This
kernel streams input slabs HBM->VMEM once, applies the ntap-deep FIR on
the VPU, runs the [L, nchan] DFT matmuls on the MXU and emits the final
packed 4+4-bit bytes — the only HBM writes are the 8x-smaller product.

Layout: input-major.  x_t is [ninput, ntime] f32 (the driver's
[ntime, ninput] stream transposed once by XLA); output is packed uint8
[ninput, nspec, nchan], which :func:`..pfb.quantize_4bit_planes_imajor`
-style callers transpose (bytes only) to the correlator's
[nspec, nchan, ninput].

Grid: (input tiles, spectra tiles).  Each instance DMAs its
(TI, (TS + ntap - 1) * L) slab — spectra tiles overlap by the (ntap-1)
FIR history, which block-index ``BlockSpec`` mappings cannot express,
hence the manual double-buffered async copy (same pattern as
:mod:`.corr_rows`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _choose_ts(nspec: int, cap: int = 128) -> int | None:
    """Largest spectra-tile size <= cap that divides nspec and keeps
    f32 sublane alignment (multiple of 8)."""
    for ts in range(min(cap, nspec), 7, -1):
        if nspec % ts == 0 and ts % 8 == 0:
            return ts
    return None


def _choose_ti(ninput: int, cap: int = 8) -> int:
    """Largest input-tile size <= cap dividing ninput (test shapes can
    be narrower than a full sublane; Mosaic pads)."""
    for ti in range(min(cap, ninput), 0, -1):
        if ninput % ti == 0:
            return ti
    return 1


def tiling_viable(nspec: int, ninput: int) -> bool:
    """Whether the fused kernel can tile these dimensions."""
    return _choose_ts(nspec) is not None and ninput >= 1


def _make_kernel(ntap: int, L: int, nchan: int, ts: int, ti: int,
                 n_s: int, precision):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    slab = (ts + ntap - 1) * L

    def kernel(xt_ref, w_ref, cos_ref, msin_ref, scale_ref, out_ref,
               xbuf, sems):
        i = pl.program_id(0)
        s = pl.program_id(1)

        def get_dma(slot, s_idx):
            return pltpu.make_async_copy(
                xt_ref.at[pl.ds(i * ti, ti),
                          pl.ds(s_idx * ts * L, slab)],
                xbuf.at[slot], sems.at[slot])

        # double-buffer across the spectra-tile axis: tile s+1's slab
        # streams in while tile s computes (grid iterates s fastest)
        slot = s % 2

        @pl.when(s == 0)
        def _():
            get_dma(0, s).start()

        @pl.when(s + 1 < n_s)
        def _():
            get_dma((s + 1) % 2, s + 1).start()

        get_dma(slot, s).wait()
        frames = xbuf[slot].reshape(ti, ts + ntap - 1, L)
        fir = frames[:, 0:ts, :] * w_ref[0]
        for k in range(1, ntap):
            fir += frames[:, k:k + ts, :] * w_ref[k]
        f2 = fir.reshape(ti * ts, L)
        re = jax.lax.dot_general(
            f2, cos_ref[:], (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        im = jax.lax.dot_general(
            f2, msin_ref[:], (((1,), (0,)), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)
        sc = scale_ref[0]
        r = jnp.clip(jnp.round(re * sc), -8, 7).astype(jnp.int32)
        q = jnp.clip(jnp.round(im * sc), -8, 7).astype(jnp.int32)
        packed = (((r & 0xF) << 4) | (q & 0xF)).astype(jnp.uint8)
        out_ref[:] = packed.reshape(ti, ts, nchan)

    return kernel


@functools.partial(jax.jit, static_argnames=("nchan", "ntap", "ti",
                                             "fast", "interpret"))
def pfb_quantize_packed_pallas(x: jax.Array, window: jax.Array,
                               nchan: int, ntap: int, scale,
                               ti: int | None = None, fast: bool = False,
                               interpret: bool = False) -> jax.Array:
    """Fused PFB + 4-bit requant.

    Args:
      x: f32 ADC samples [ntime, ninput],
        ntime == (nspec + ntap - 1) * 2 * nchan.
      window: f32 [ntap, 2*nchan] prototype filter.
      scale: scalar or per-channel [nchan] requant gain.
      fast: single-pass bf16 DFT matmuls (~1e-2) instead of the
        3-pass HIGHEST split (~1e-6).

    Returns:
      uint8 packed [ninput, nspec, nchan] (input-major; transpose the
      bytes for the correlator's [nspec, nchan, ninput]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..pfb import rdft_matrices

    L = 2 * nchan
    ntime, ninput = x.shape
    if ntime % L:
        raise ValueError("ntime must be a multiple of 2*nchan")
    nspec = ntime // L - (ntap - 1)
    ts = _choose_ts(nspec)
    if ti is None:
        ti = _choose_ti(ninput)
    if ts is None or ninput % ti:
        raise ValueError(f"no viable tiling for nspec={nspec}, "
                         f"ninput={ninput}")
    n_i, n_s = ninput // ti, nspec // ts

    xt = x.T  # [ninput, ntime]; one XLA transpose, folded where possible
    cos_m, msin_m = (jnp.asarray(m) for m in rdft_matrices(nchan))
    sc = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (nchan,))
    precision = (jax.lax.Precision.DEFAULT if fast
                 else jax.lax.Precision.HIGHEST)

    kernel = _make_kernel(ntap, L, nchan, ts, ti, n_s, precision)
    slab = (ts + ntap - 1) * L
    out = pl.pallas_call(
        kernel,
        grid=(n_i, n_s),
        in_specs=[
            pl.BlockSpec((ninput, ntime), lambda i, s: (0, 0),
                         memory_space=pl.ANY),      # whole stream, HBM
            pl.BlockSpec((ntap, L), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, nchan), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, nchan), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nchan), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, ts, nchan), lambda i, s: (i, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ninput, nspec, nchan),
                                       jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, ti, slab), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * ninput * nspec * L * (ntap + 2 * nchan),
            bytes_accessed=(4 * ninput * ntime
                            + ninput * nspec * nchan),
            transcendentals=0),
    )(xt, window, cos_m, msin_m, sc.reshape(1, nchan))
    return out
