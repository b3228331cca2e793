"""Baseline subselection with channel averaging.

Replaces ``bfXgpuSubSelect`` (reference: blocks/corr_subsel_block.py:298):
pick ``nvis_out`` single-pol visibilities out of the full matrix by
(stand, pol) pairs, conjugating as needed, and sum groups of ``nchan_sum``
adjacent channels.  In the reference the selection indexes xGPU's packed
triangular buffer through the ``antpol_to_bl``/``bl_is_conj`` maps; with the
dense [chan, input, input] layout the full Hermitian matrix is available so
the selection is a plain gather — ``vis[c, i0, i1]`` *is*
``v(i0) * conj(v(i1))`` — and no conjugation fix-up is required.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .correlate import Vis


def baselines_to_inputs(baselines, npol: int = 2) -> np.ndarray:
    """[nvis, 2, 2] listing of ((s0, p0), (s1, p1)) -> [nvis, 2] input idx.

    The baseline-list format matches the runtime-reloadable command key
    (reference: blocks/corr_subsel_block.py docstring, and the control-side
    validation at pipeline-control/.../corr_subsel_control.py).  The first
    entry is the unconjugated input, the second the conjugated one.
    """
    b = np.asarray(baselines, dtype=np.int64)
    if b.ndim != 3 or b.shape[1:] != (2, 2):
        raise ValueError("baselines must be [nvis, 2, 2]")
    return b[:, :, 0] * npol + b[:, :, 1]


def default_baselines(nvis_out: int, nstand: int) -> list:
    """Default selection: pol-0 autos cycling over stands
    (reference: corr_subsel_block.py:231-233)."""
    return [[[i % nstand, 0], [i % nstand, 0]] for i in range(nvis_out)]


def production_baselines(nvis_out: int, nstand: int,
                         npol: int = 2) -> list:
    """The production-shaped selection: every pol pair of every stand
    pair (incl. autos) among the first K stands, where
    ``K*(K+1)/2 * npol**2 == nvis_out`` — this is where the reference's
    ``nvis_out = 48*49*4/2 = 4704`` comes from
    (reference: blocks/corr_subsel_block.py:185).  Falls back to
    :func:`default_baselines` when nvis_out is not such a triangle
    count."""
    k = int((math.isqrt(8 * (nvis_out // npol ** 2) + 1) - 1) // 2)
    if k * (k + 1) // 2 * npol ** 2 != nvis_out or k > nstand:
        return default_baselines(nvis_out, nstand)
    return [[[s0, p0], [s1, p1]]
            for s0 in range(k) for s1 in range(s0, k)
            for p0 in range(npol) for p1 in range(npol)]


def corr_subsel(vis: Vis, input_pairs: jax.Array, nchan_sum: int) -> Vis:
    """Gather + channel-sum.

    Args:
      vis: dense int32 Vis [nchan, ninput, ninput].
      input_pairs: int32 [nvis, 2] (unconjugated, conjugated) input indices.
      nchan_sum: adjacent channels summed per output channel
        (CORR_SUBSEL_NCHAN_SUM=4, reference: lwa352-pipeline.py:175).

    Returns:
      int32 Vis with arrays [nchan // nchan_sum, nvis]
      (the ci32 [nchan_out, nvis_out] output buffer layout,
      reference: corr_subsel_block.py:214-216).
    """
    nchan, ninput, _ = vis.real.shape
    if nchan % nchan_sum:
        raise ValueError("nchan must be a multiple of nchan_sum")
    i0 = input_pairs[:, 0]
    i1 = input_pairs[:, 1]
    # Gather from the upper triangle only (v[i0, i1] == conj(v[i1, i0])),
    # so the selection also works on triangular-engine accumulators whose
    # lower-triangle tiles are never computed.
    lo = jnp.minimum(i0, i1)
    hi = jnp.maximum(i0, i1)
    sign = jnp.where(i0 <= i1, 1, -1).astype(jnp.int32)
    # malformed selections (a runtime 'baselines' command with a stand
    # or pol out of range) clamp to the nearest valid input, so both
    # engines stay bounded, deterministic, and identical; without this
    # the flattened take() would wrap an OOB hi into the next row
    lo = jnp.clip(lo, 0, ninput - 1)
    hi = jnp.clip(hi, 0, ninput - 1)

    # Flatten the (lo, hi) pair to ONE take() axis: XLA lowers the
    # single-axis gather from the flattened [nchan, ninput^2] view much
    # better than the 2-axis advanced index ``vis[:, lo, hi]`` (measured
    # 5.5 vs 7.0 ms standalone at the production shape on TPU v5e).
    # Summing channel groups BEFORE the gather is exact but NOT a win:
    # XLA's strided reduction over the full cube costs more than the
    # 4x-smaller gather saves (7.1 ms measured).
    idx = lo * ninput + hi
    sel_r = jnp.take(vis.real.reshape(nchan, ninput * ninput), idx, axis=1)
    sel_i = jnp.take(vis.imag.reshape(nchan, ninput * ninput), idx,
                     axis=1) * sign

    def csum(x):
        return x.reshape(nchan // nchan_sum, nchan_sum, -1).sum(
            axis=1, dtype=jnp.int32)

    return Vis(csum(sel_r), csum(sel_i))


def _occupancy(band_of: jax.Array, nb_tot: int, budget: int):
    """In-graph band occupancy -> (slot map, used count, band list).

    ``slot_of_band[b]`` is the compact slab slot of band ``b`` (valid
    where occupied); ``bands_list`` is the budget-sized slot->band map
    (unused entries hold 0 — harmless duplicate DMA)."""
    occ = jnp.zeros(nb_tot, jnp.int32).at[band_of].set(1)
    pos = jnp.cumsum(occ)
    slot_of_band = pos - 1                      # valid where occ == 1
    nused = pos[-1]
    scatter_idx = jnp.where(occ == 1, slot_of_band, budget)
    bands_list = jnp.zeros(budget, jnp.int32).at[scatter_idx].set(
        jnp.arange(nb_tot, dtype=jnp.int32), mode="drop")
    return slot_of_band, nused, bands_list


def corr_subsel_bands(vis: Vis, input_pairs: jax.Array, nchan_sum: int,
                      budget: int = 16, col_budget: int = 2,
                      interpret: bool = False) -> Vis:
    """Block-compacted gather: DMA only the occupied (8-row x 128-col)
    blocks of the matrix into a compact slab (Pallas, pure block DMA),
    then take() elements from the much smaller operand.

    XLA's element gather is operand-read-bound (it costs ~the whole
    906 MB cube at the production shape); the production selection
    (all pol pairs among the first 48 stands — 4704 = 48*49*4/2
    visibilities, corr_subsel_block.py:185) touches only inputs 0..95,
    i.e. 12 of 96 row-bands AND 1 of 6 column-tiles, so the 2-D slab
    shrinks the take() operand ~48x.  When the column tiles exceed
    ``col_budget`` (or ``ni % 128 != 0`` — e.g. the unpadded 704-input
    matrix of the XLA correlator engine) the slab compacts rows only
    (8x at production); when the rows exceed ``budget`` bands — e.g.
    the autos-cycling default selection that touches every stand —
    a ``lax.cond`` falls back to the flat take() on the full cube.
    Band lists and slab indices are computed in-graph from
    ``input_pairs`` (the runtime-reloadable 'baselines' command changes
    them without a host round trip).  Output is bit-identical to
    :func:`corr_subsel` on every branch.

    The static budgets size the slab (every budget entry is DMA'd,
    duplicates included): 16 row-bands x 2 column-tiles covers the
    production selection (12 x 1) with margin at a
    [nchan, 128, 256] slab — ~150 MB of total traffic per dump vs the
    flat take's ~one cube read (~2 GB at the padded production
    shape)."""
    from .pallas.subsel_gather import band_extract, block_extract

    nchan, ni, _ = vis.real.shape
    if nchan % nchan_sum:
        raise ValueError("nchan must be a multiple of nchan_sum")
    if ni % 8 or budget * 8 >= ni:
        return corr_subsel(vis, input_pairs, nchan_sum)
    nvis = input_pairs.shape[0]
    i0, i1 = input_pairs[:, 0], input_pairs[:, 1]
    lo = jnp.clip(jnp.minimum(i0, i1), 0, ni - 1)
    hi = jnp.clip(jnp.maximum(i0, i1), 0, ni - 1)
    sign = jnp.where(i0 <= i1, 1, -1).astype(jnp.int32)

    nb_tot = ni // 8
    band_of = (lo // 8).astype(jnp.int32)
    rslot, nused, bands_list = _occupancy(band_of, nb_tot, budget)
    idx_rows = (rslot[band_of] * 8 + lo % 8) * ni + hi
    idx_flat = lo * ni + hi

    # 2-D refinement: also compact 128-column tiles when the matrix
    # width allows and the slab would actually be smaller
    use2d = (ni % 128 == 0
             and budget * 8 * col_budget * 128 < ni * ni)
    if use2d:
        ctile_of = (hi // 128).astype(jnp.int32)
        cslot, ncused, ctiles_list = _occupancy(ctile_of, ni // 128,
                                                col_budget)
        idx_blk = ((rslot[band_of] * 8 + lo % 8) * (col_budget * 128)
                   + cslot[ctile_of] * 128 + hi % 128)
    else:
        ncused = jnp.int32(0)
        ctiles_list = idx_blk = jnp.zeros((0,), jnp.int32)

    def blocks_branch(vr, vi, args):
        slab_r, slab_i = block_extract(vr, vi, args["rbands"],
                                       args["ctiles"],
                                       interpret=interpret)
        w = budget * 8 * col_budget * 128
        sr = jnp.take(slab_r.reshape(nchan, w), args["idx_blk"], axis=1)
        si = jnp.take(slab_i.reshape(nchan, w), args["idx_blk"], axis=1)
        return sr, si

    def bands_branch(vr, vi, args):
        slab_r, slab_i = band_extract(vr, vi, args["rbands"],
                                      interpret=interpret)
        sr = jnp.take(slab_r.reshape(nchan, budget * 8 * ni),
                      args["idx_rows"], axis=1)
        si = jnp.take(slab_i.reshape(nchan, budget * 8 * ni),
                      args["idx_rows"], axis=1)
        return sr, si

    def take_branch(vr, vi, args):
        sr = jnp.take(vr.reshape(nchan, ni * ni), args["idx_flat"],
                      axis=1)
        si = jnp.take(vi.reshape(nchan, ni * ni), args["idx_flat"],
                      axis=1)
        return sr, si

    def rows_or_flat(vr, vi, args):
        return jax.lax.cond(nused <= budget, bands_branch, take_branch,
                            vr, vi, args)

    args = {"rbands": bands_list, "ctiles": ctiles_list,
            "idx_blk": idx_blk, "idx_rows": idx_rows,
            "idx_flat": idx_flat}
    if use2d:
        fits2d = jnp.logical_and(nused <= budget, ncused <= col_budget)
        sel_r, sel_i = jax.lax.cond(fits2d, blocks_branch, rows_or_flat,
                                    vis.real, vis.imag, args)
    else:
        sel_r, sel_i = rows_or_flat(vis.real, vis.imag, args)
    sel_i = sel_i * sign

    def csum(x):
        return x.reshape(nchan // nchan_sum, nchan_sum, nvis).sum(
            axis=1, dtype=jnp.int32)

    return Vis(csum(sel_r), csum(sel_i))


def corr_subsel_engine(vis: Vis, input_pairs: jax.Array, nchan_sum: int,
                       engine: str, interpret: bool) -> Vis:
    """Engine dispatch shared by the fused step and the per-shard mesh
    path: ``"xla"`` (flat take()), ``"bands"`` (band-compacted slab +
    small take, with in-graph fallback to the flat take for
    band-dense selections), or ``"pallas"`` (the lane-gather kernel).
    All engines gather the same int32 elements — outputs are
    bit-identical."""
    if engine == "pallas":
        from .pallas.subsel_gather import corr_subsel_pallas

        return corr_subsel_pallas(vis, input_pairs, nchan_sum,
                                  interpret=interpret)
    if engine == "bands":
        return corr_subsel_bands(vis, input_pairs, nchan_sum,
                                 interpret=interpret)
    return corr_subsel(vis, input_pairs, nchan_sum)


def subsel_output_sfreq(sfreq: float, bw_hz: float, nchan: int,
                        nchan_sum: int) -> float:
    """Output header sfreq arithmetic, kept reference-identical
    (reference: corr_subsel_block.py:268-270)."""
    chan_width = bw_hz / nchan
    return (sfreq + ((nchan_sum - 1) * chan_width)) / nchan_sum
