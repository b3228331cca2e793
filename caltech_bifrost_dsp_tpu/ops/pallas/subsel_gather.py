"""Pallas TPU kernel: baseline-subselection gather.

The XLA ``take()`` subselection (ops/corr_subsel.py — the
``bfXgpuSubSelect`` analog, reference: blocks/corr_subsel_block.py:298)
costs ~3 ms standalone / ~2 ms in-step at the production shape against a
0.04 ms minimum-traffic roofline: XLA's gather of 4704 scattered int32
elements per 2.4 MB channel plane reads far more than it keeps.

This kernel expresses the 2-D element gather ``out[v] = M[lo[v], hi[v]]``
as lane gathers (the only vectorized-gather direction Mosaic supports,
``tpu.DynamicGatherOp`` on the minor axis) plus masked reductions, per
(channel-group, baseline-chunk) grid instance.  Two hardware constraints
shape it:

- Mosaic's dynamic gather is **tile-local**: indices address lanes
  within one 128-lane tile only ("Input offsets outside of the first
  tile").  So each 128-output segment gathers once per 128-column tile
  of the plane with ``hi % 128`` and combines the per-tile results with
  a ``hi // 128 == t`` select.
- The index operand must be shaped like the gather operand, so the
  column indices are broadcast over all NI rows; the row pick is then a
  masked sublane reduction ``out[j] = sum_r (r == lo[j]) * G[r, j]``
  rather than a transpose + second gather.

The channel plane block is VMEM-resident and its block index is constant
across the inner chunk axis, so Mosaic fetches each plane from HBM once
— the kernel's HBM traffic is one cube read (the gather itself never
touches HBM), where XLA's take was measured at ~2.7x that.  The
trade-off is VPU work: every 128-output segment touches all NI rows and
all NI/128 tiles, so per gathered element the kernel moves ~NI vector
lanes.  Whether that beats XLA's extra HBM reads is measured, not
assumed — see docs/performance.md (Knobs) for the recorded A/B at the
production shape.

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
_LANE = 128


def _kernel(vr_ref, vi_ref, lo_ref, hi_ref, or_ref, oi_ref):
    lo = lo_ref[0]                              # [VCH]
    hi = hi_ref[0]
    cch, ni = vr_ref.shape[0], vr_ref.shape[1]
    nt = vr_ref.shape[2] // _LANE               # minor axis padded to 128s
    # all cch channel planes gather in one op on the sublane-merged
    # [cch*ni, LANE] view — 8x fewer/larger VPU ops than a per-plane loop
    riota = jax.lax.broadcasted_iota(
        jnp.int32, (cch, ni, _LANE), 1)
    for s in range(_VCH // _LANE):              # 128-output segments
        hs = hi[s * _LANE:(s + 1) * _LANE]
        ls = lo[s * _LANE:(s + 1) * _LANE]
        tj = (hs // _LANE)[None, :]             # column tile of each output
        ljb = jnp.broadcast_to((hs % _LANE)[None, :], (cch * ni, _LANE))
        rmask = riota == ls[None, None, :]      # row-pick mask
        for m_ref, o_ref in ((vr_ref, or_ref), (vi_ref, oi_ref)):
            g = jnp.zeros((cch * ni, _LANE), jnp.int32)
            for t in range(nt):                 # tile-local lane gathers
                mt = m_ref[:, :, t * _LANE:(t + 1) * _LANE].reshape(
                    cch * ni, _LANE)
                gt = jnp.take_along_axis(mt, ljb, axis=1)
                g = jnp.where(tj == t, gt, g)
            o_ref[:, s * _LANE:(s + 1) * _LANE] = jnp.where(
                rmask, g.reshape(cch, ni, _LANE), 0).sum(
                    axis=1, dtype=jnp.int32)


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
    # 8 channel planes per grid instance so the (cch, VCH) output block
    # satisfies Mosaic's sublane tiling (second-to-last dim % 8 == 0, or
    # the full axis for small nchan); the plane-block index is constant
    # across the inner chunk axis, so the cube is still read once.  The
    # minor axis is padded up to a 128-lane multiple at the BlockSpec
    # (Pallas allows blocks overrunning the array; the pad lanes hold
    # unspecified bytes and are never selected because hi < ni)
    cch = 8 if nchan % 8 == 0 else nchan
    nip = -(-ni // _LANE) * _LANE
    grid = (nchan // cch, nk)
    sel_r, sel_i = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((cch, ni, nip), lambda c, k: (c, 0, 0)),
            pl.BlockSpec((cch, ni, nip), lambda c, k: (c, 0, 0)),
            pl.BlockSpec((1, _VCH), lambda c, k: (0, k)),
            pl.BlockSpec((1, _VCH), lambda c, k: (0, k)),
        ],
        out_specs=[
            pl.BlockSpec((cch, _VCH), lambda c, k: (c, k)),
            pl.BlockSpec((cch, _VCH), lambda c, k: (c, k)),
        ],
        out_shape=[jax.ShapeDtypeStruct((nchan, nvp), jnp.int32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(vis.real, vis.imag, lo_p, hi_p)
    sel_r = sel_r[:, :nvis]
    sel_i = sel_i[:, :nvis] * sign

    def csum(x):
        return x.reshape(nchan // nchan_sum, nchan_sum, nvis).sum(
            axis=1, dtype=jnp.int32)

    return Vis(csum(sel_r), csum(sel_i))


def _band_copy_kernel(bands_ref, vr_ref, vi_ref, or_ref, oi_ref):
    or_ref[:] = vr_ref[:]
    oi_ref[:] = vi_ref[:]


def _block_copy_kernel(rbands_ref, cbands_ref, vr_ref, vi_ref,
                       or_ref, oi_ref):
    or_ref[:] = vr_ref[:]
    oi_ref[:] = vi_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_extract(vr: jax.Array, vi: jax.Array, rbands: jax.Array,
                  cbands: jax.Array, interpret: bool = False
                  ) -> tuple[jax.Array, jax.Array]:
    """Copy the selected (8-row x 128-col) blocks of both visibility
    planes into a compact 2-D slab — pure scalar-prefetched block DMA.

    Two-dimensional refinement of :func:`band_extract`: the production
    baseline selection (all pol pairs among the first 48 stands,
    reference: blocks/corr_subsel_block.py:185) occupies inputs 0..95,
    i.e. 12 of 96 row-bands AND 1 of 6 column-tiles of the 768-padded
    matrix — compacting both axes shrinks the take() operand ~48x
    (226 MB -> ~19 MB at the production shape), which puts the gather
    at its minimum-traffic roofline instead of the cube-read floor.

    Args:
      vr, vi: int32 [nchan, ni, ni] visibility planes
        (ni % 8 == 0 and ni % 128 == 0).
      rbands: int32 [row_budget] 8-row band indices.
      cbands: int32 [col_budget] 128-column tile indices (entries past
        the used count may duplicate 0 — harmless extra DMA).

    Returns:
      (slab_r, slab_i): int32 [nchan, row_budget * 8, col_budget * 128]
      with ``slab[:, 8*r:8*r+8, 128*c:128*c+128]
      == v[:, 8*rbands[r]:..., 128*cbands[c]:...]``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchan, ni, _ = vr.shape
    nrb = rbands.shape[0]
    ncb = cbands.shape[0]
    cch = 1
    for cand in (8, 4, 2):
        if nchan % cand == 0:
            cch = cand
            break
    spec_in = pl.BlockSpec(
        (cch, 8, _LANE),
        lambda c, r, k, rbands, cbands: (c, rbands[r], cbands[k]))
    spec_out = pl.BlockSpec(
        (cch, 8, _LANE), lambda c, r, k, rbands, cbands: (c, r, k))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchan // cch, nrb, ncb),
        in_specs=[spec_in, spec_in],
        out_specs=[spec_out, spec_out],
    )
    return pl.pallas_call(
        _block_copy_kernel, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((nchan, nrb * 8, ncb * _LANE),
                                        jnp.int32)] * 2,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rbands, cbands, vr, vi)


@functools.partial(jax.jit, static_argnames=("interpret",))
def band_extract(vr: jax.Array, vi: jax.Array, bands: jax.Array,
                 interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Copy the selected 8-row bands of both visibility planes into a
    compact slab — pure scalar-prefetched block DMA, no compute.

    The baseline-subselection gather is operand-read-bound in XLA
    (take() reads ~the whole 906 MB cube at the production shape); DMAing
    only the 8-row bands that contain selected baselines first shrinks
    the take() operand by the band occupancy (e.g. 12/96 bands for the
    production all-pairs-among-48-stands selection,
    reference: blocks/corr_subsel_block.py:185).  8 rows is the finest
    sublane granularity Mosaic block specs allow.

    Args:
      vr, vi: int32 [nchan, ni, ni] visibility planes (ni % 8 == 0).
      bands: int32 [budget] 8-row band indices (entries past the used
        count may duplicate band 0 — harmless extra DMA).

    Returns:
      (slab_r, slab_i): int32 [nchan, budget * 8, ni] with
      ``slab[:, 8*s:8*s+8, :] == v[:, 8*bands[s]:8*bands[s]+8, :]``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchan, ni, _ = vr.shape
    nb = bands.shape[0]
    cch = 1
    for cand in (8, 4, 2):
        if nchan % cand == 0:
            cch = cand
            break
    spec_in = pl.BlockSpec((cch, 8, ni), lambda c, b, bands: (c, bands[b], 0))
    spec_out = pl.BlockSpec((cch, 8, ni), lambda c, b, bands: (c, b, 0))
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchan // cch, nb),
        in_specs=[spec_in, spec_in],
        out_specs=[spec_out, spec_out],
    )
    return pl.pallas_call(
        _band_copy_kernel, grid_spec=gs,
        out_shape=[jax.ShapeDtypeStruct((nchan, nb * 8, ni),
                                        jnp.int32)] * 2,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(bands, vr, vi)
