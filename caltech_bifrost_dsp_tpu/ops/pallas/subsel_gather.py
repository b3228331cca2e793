"""Pallas TPU kernel: baseline-subselection gather.

The XLA ``take()`` subselection (ops/corr_subsel.py — the
``bfXgpuSubSelect`` analog, reference: blocks/corr_subsel_block.py:298)
costs ~3 ms standalone / ~2 ms in-step at the production shape against a
0.04 ms minimum-traffic roofline: XLA's gather of 4704 scattered int32
elements per 2.4 MB channel plane reads far more than it keeps.

This kernel expresses the 2-D element gather ``out[v] = M[lo[v], hi[v]]``
as two LANE gathers (the only vectorized-gather direction Mosaic
supports, ``tpu.DynamicGatherOp`` on the minor axis) with a transpose in
between, per (channel, baseline-chunk) grid instance:

    G[r, j] = M[r, hi[j]]      lane gather, idx broadcast over rows
    out[j]  = G.T[j, lo[j]]    transpose + lane gather, one per row

The channel plane block is VMEM-resident and its block index is constant
across the inner chunk axis, so Mosaic fetches each plane from HBM once
— the kernel's HBM traffic is one cube read (the gather itself never
touches HBM), where XLA's take was measured at ~2.7x that.

Everything around the gather (upper-triangle index fold, conjugation
sign, channel-group summation) stays in XLA — elementwise on the small
[nchan, nvis] result.  Output is bit-identical to
:func:`..corr_subsel.corr_subsel` (both gather the same int32 elements).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..correlate import Vis

_VCH = 512  # baselines per grid instance (4 lane-vregs)


def _kernel(vr_ref, vi_ref, lo_ref, hi_ref, or_ref, oi_ref):
    lo = lo_ref[0]                              # [VCH]
    hi = hi_ref[0]
    ni = vr_ref.shape[1]
    hib = jnp.broadcast_to(hi[None, :], (ni, _VCH))
    lob = lo[:, None]
    for m_ref, o_ref in ((vr_ref, or_ref), (vi_ref, oi_ref)):
        m = m_ref[0]                            # [NI, NI]
        g = jnp.take_along_axis(m, hib, axis=1)  # [NI, VCH]
        gt = g.T                                 # [VCH, NI]
        o_ref[0] = jnp.take_along_axis(gt, lob, axis=1)[:, 0]


@functools.partial(jax.jit, static_argnames=("nchan_sum", "interpret"))
def corr_subsel_pallas(vis: Vis, input_pairs: jax.Array, nchan_sum: int,
                       interpret: bool = False) -> Vis:
    """Drop-in for :func:`..corr_subsel.corr_subsel` (same args/output).

    ``input_pairs`` int32 [nvis, 2] (unconjugated, conjugated); output
    int32 Vis [nchan // nchan_sum, nvis].
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchan, ni, _ = vis.real.shape
    if nchan % nchan_sum:
        raise ValueError("nchan must be a multiple of nchan_sum")
    nvis = input_pairs.shape[0]
    i0, i1 = input_pairs[:, 0], input_pairs[:, 1]
    lo = jnp.minimum(i0, i1).astype(jnp.int32)
    hi = jnp.maximum(i0, i1).astype(jnp.int32)
    sign = jnp.where(i0 <= i1, 1, -1).astype(jnp.int32)
    # clamp like XLA's take() does under jit: out-of-range pairs (a
    # malformed runtime 'baselines' command) must stay bounded and
    # deterministic — Mosaic's dynamic-gather OOB reads are undefined
    lo = jnp.clip(lo, 0, ni - 1)
    hi = jnp.clip(hi, 0, ni - 1)

    nvp = -(-nvis // _VCH) * _VCH
    pad = nvp - nvis
    lo_p = jnp.pad(lo, (0, pad))[None, :]       # [1, nvp]
    hi_p = jnp.pad(hi, (0, pad))[None, :]

    nk = nvp // _VCH
    grid = (nchan, nk)
    sel_r, sel_i = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ni, ni), lambda c, k: (c, 0, 0)),
            pl.BlockSpec((1, ni, ni), lambda c, k: (c, 0, 0)),
            pl.BlockSpec((1, _VCH), lambda c, k: (0, k)),
            pl.BlockSpec((1, _VCH), lambda c, k: (0, k)),
        ],
        out_specs=[
            pl.BlockSpec((1, _VCH), lambda c, k: (c, k)),
            pl.BlockSpec((1, _VCH), lambda c, k: (c, k)),
        ],
        out_shape=[jax.ShapeDtypeStruct((nchan, nvp), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(vis.real, vis.imag, lo_p, hi_p)
    sel_r = sel_r[:, :nvis]
    sel_i = sel_i[:, :nvis] * sign

    def csum(x):
        return x.reshape(nchan // nchan_sum, nchan_sum, nvis).sum(
            axis=1, dtype=jnp.int32)

    return Vis(csum(sel_r), csum(sel_i))
