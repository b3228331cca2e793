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


def corr_subsel_engine(vis: Vis, input_pairs: jax.Array, nchan_sum: int,
                       engine: str, interpret: bool) -> Vis:
    """Engine dispatch shared by the fused step and the per-shard mesh
    path: ``"xla"`` (flat take(), above) or ``"pallas"`` (the
    lane-gather kernel — one HBM cube read vs take's ~2.7x; output
    bit-identical)."""
    if engine == "pallas":
        from .pallas.subsel_gather import corr_subsel_pallas

        return corr_subsel_pallas(vis, input_pairs, nchan_sum,
                                  interpret=interpret)
    return corr_subsel(vis, input_pairs, nchan_sum)


def subsel_output_sfreq(sfreq: float, bw_hz: float, nchan: int,
                        nchan_sum: int) -> float:
    """Output header sfreq arithmetic, kept reference-identical
    (reference: corr_subsel_block.py:268-270)."""
    chan_width = bw_hz / nchan
    return (sfreq + ((nchan_sum - 1) * chan_width)) / nchan_sum
