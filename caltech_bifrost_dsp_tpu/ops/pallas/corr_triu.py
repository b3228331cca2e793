"""Pallas TPU kernel: fused unpack + upper-triangular correlation.

Replaces the XLA full-matrix correlator path for the hot loop.  xGPU gets
its speed from computing only the triangular half of the visibility
matrix (reference: install_xgpu.sh register-tile config, SURVEY.md
section 2.2); XLA's dense ``dot_general`` cannot skip the redundant
half.  This kernel:

- iterates a (chan, tile-pair) grid over only the ``j >= i`` 128x128
  input-tile pairs (21 of 36 for 704 inputs -> 42% less MXU work),
- unpacks the 4+4-bit bytes to bf16 planes *in VMEM* (no HBM
  materialization of the unpacked operands),
- contracts over the full accumulation window with f32 MXU accumulation
  (exact for 4-bit data, see ops/correlate.py) and writes int32 tiles.

The lower-triangle tiles of the output are never touched; consumers use
:func:`mirror_vis` (Hermitian fill, amortized per dump) or the
conjugated-gather subselection path which needs only the upper triangle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.correlate import Vis

TILE = 128


def _tile_pairs(ntile: int) -> np.ndarray:
    """[npair, 2] (i, j) with j >= i, row-major over the upper triangle."""
    return np.array([(i, j) for i in range(ntile)
                     for j in range(i, ntile)], dtype=np.int32)


def _kernel(ti_ref, tj_ref, a_ref, b_ref, vr_ref, vi_ref):
    """One (chan, tile-pair) instance.

    a_ref/b_ref: uint8 [1, T, TILE] packed samples (chan-major layout)
    for input tiles i / j.
    vr_ref/vi_ref: int32 [1, TILE, TILE] output visibility tile.
    """
    # 4+4-bit unpack (sign extension via (v ^ 8) - 8) in int32 lanes —
    # Mosaic rejects sub-word shifts/xor on (u)int8 vectors — then bf16.
    a = a_ref[0].astype(jnp.int32)
    b = b_ref[0].astype(jnp.int32)
    ar = (((a >> 4) ^ 8) - 8).astype(jnp.bfloat16)
    ai = (((a & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
    br = (((b >> 4) ^ 8) - 8).astype(jnp.bfloat16)
    bi = (((b & 0xF) ^ 8) - 8).astype(jnp.bfloat16)

    dn = (((0,), (0,)), ((), ()))  # contract T, no batch

    def dot(x, y):
        return jax.lax.dot_general(x, y, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    vr = dot(ar, br) + dot(ai, bi)
    vi = dot(ai, br) - dot(ar, bi)
    vr_ref[0] = vr.astype(jnp.int32)
    vi_ref[0] = vi.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def packed_corr_triu(packed: jax.Array, interpret: bool = False) -> Vis:
    """Correlate a packed block, computing only upper-triangle tiles.

    Args:
      packed: uint8 [ntime, nchan, ninput].

    Returns:
      int32 Vis [nchan, ninput, ninput]; entries with
      ``tile(j) >= tile(i)`` are valid, the rest are unspecified (zero).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntime, nchan, ninput = packed.shape
    pad = (-ninput) % TILE
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, pad)))
    ni = ninput + pad
    # chan-major layout so the blocks' trailing dims are (ntime, TILE)
    # (Mosaic requires the last two block dims tile-aligned)
    packed_cm = jnp.transpose(packed, (1, 0, 2))  # [C, T, I]
    ntile = ni // TILE
    pairs = _tile_pairs(ntile)
    npair = len(pairs)
    ti = jnp.asarray(pairs[:, 0])
    tj = jnp.asarray(pairs[:, 1])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchan, npair),
        in_specs=[
            pl.BlockSpec((1, ntime, TILE),
                         lambda c, k, ti, tj: (c, 0, ti[k])),
            pl.BlockSpec((1, ntime, TILE),
                         lambda c, k, ti, tj: (c, 0, tj[k])),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE, TILE),
                         lambda c, k, ti, tj: (c, ti[k], tj[k])),
            pl.BlockSpec((1, TILE, TILE),
                         lambda c, k, ti, tj: (c, ti[k], tj[k])),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((nchan, ni, ni), jnp.int32)] * 2
    vr, vi = pl.pallas_call(
        _kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * nchan * npair * TILE * TILE * 2 * ntime,
            bytes_accessed=(2 * nchan * npair * ntime * TILE
                            + 8 * nchan * npair * TILE * TILE),
            transcendentals=0),
    )(ti, tj, packed_cm, packed_cm)
    if pad:
        vr = vr[:, :ninput, :ninput]
        vi = vi[:, :ninput, :ninput]
    return Vis(vr, vi)


@jax.jit
def mirror_vis(vis: Vis) -> Vis:
    """Hermitian fill: valid upper triangle -> full dense matrix.

    Elementwise ``j >= i`` selects the computed half; the mirror is its
    conjugate transpose.  Called once per dump, not per accumulate.
    """
    nchan, ni, _ = vis.real.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (ni, ni), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ni, ni), 1)
    upper = (col >= row)[None]
    vr = jnp.where(upper, vis.real, jnp.swapaxes(vis.real, 1, 2))
    vi = jnp.where(upper, vis.imag, -jnp.swapaxes(vis.imag, 1, 2))
    return Vis(vr, vi)
