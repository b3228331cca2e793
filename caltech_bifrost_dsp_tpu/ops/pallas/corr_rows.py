"""Pallas TPU kernel: row-blocked triangular correlator.

Second-generation kernel (v1: :mod:`.corr_triu`).  The tile-pair grid of
v1 fetches and unpacks BOTH input tiles per pair, so its HBM traffic and
VPU unpack work scale with the pair count.  Here the grid is
(chan, row-tile): each instance unpacks its row tile once, then streams
the ``j >= i`` column tiles from HBM with double-buffered async DMA,
overlapping the next tile's fetch with the current MXU contraction —
the classic xGPU-style register-tile schedule, expressed in Pallas.

Per-chan fetches drop from 2*npair tiles (42 for 704 inputs) to
ntile + npair (27), and each row tile is unpacked once per row instead
of once per pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ...ops.correlate import Vis
from .corr_triu import TILE, mirror_vis  # noqa: F401  (shared API)


def _unpack_bf16(tile_u8):
    """uint8 [T, TILE] -> (re, im) bf16 planes (int32-lane arithmetic —
    Mosaic rejects sub-word shifts)."""
    a = tile_u8.astype(jnp.int32)
    re = (((a >> 4) ^ 8) - 8).astype(jnp.bfloat16)
    im = (((a & 0xF) ^ 8) - 8).astype(jnp.bfloat16)
    return re, im


def _make_kernel(ntile: int, ntime: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(row_ref, hbm_ref, vr_ref, vi_ref, jbuf, sems):
        c = pl.program_id(0)
        i = pl.program_id(1)
        ar, ai = _unpack_bf16(row_ref[0])

        def get_dma(slot, j):
            return pltpu.make_async_copy(
                hbm_ref.at[c, :, pl.ds(j * TILE, TILE)],
                jbuf.at[slot], sems.at[slot])

        # warm-up: fetch the diagonal tile (j = i)
        get_dma(0, i).start()

        dn = (((0,), (0,)), ((), ()))

        def dot(x, y):
            return jax.lax.dot_general(
                x, y, dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        def body(j, _):
            slot = (j - i) % 2
            nxt = (j - i + 1) % 2

            @pl.when(j + 1 < ntile)
            def _():
                get_dma(nxt, j + 1).start()

            get_dma(slot, j).wait()
            br, bi = _unpack_bf16(jbuf[slot])
            vr = dot(ar, br) + dot(ai, bi)
            vi = dot(ai, br) - dot(ar, bi)
            vr_ref[0, :, pl.ds(j * TILE, TILE)] = vr.astype(jnp.int32)
            vi_ref[0, :, pl.ds(j * TILE, TILE)] = vi.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(i, ntile, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def packed_corr_rows(packed: jax.Array, interpret: bool = False) -> Vis:
    """Row-blocked triangular correlation of a packed block.

    Args:
      packed: uint8 [ntime, nchan, ninput].

    Returns:
      int32 Vis [nchan, ninput, ninput]; row-tile strips ``j >= i`` are
      valid (use :func:`mirror_vis` for the full Hermitian matrix).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntime, nchan, ninput = packed.shape
    pad = (-ninput) % TILE
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, pad)))
    ni = ninput + pad
    ntile = ni // TILE
    packed_cm = jnp.transpose(packed, (1, 0, 2))  # [C, T, I]

    kernel = _make_kernel(ntile, ntime)
    out_shape = [jax.ShapeDtypeStruct((nchan, ni, ni), jnp.int32)] * 2
    vr, vi = pl.pallas_call(
        kernel,
        grid=(nchan, ntile),
        in_specs=[
            pl.BlockSpec((1, ntime, TILE),
                         lambda c, i: (c, 0, i),
                         memory_space=pltpu.VMEM),     # row tile
            pl.BlockSpec((nchan, ntime, ni),
                         lambda c, i: (0, 0, 0),
                         memory_space=pl.ANY),        # whole array, HBM
                                                       # (Mosaic requires
                                                       # trivial ANY specs)
        ],
        out_specs=[
            pl.BlockSpec((1, TILE, ni), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE, ni), lambda c, i: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, ntime, TILE), jnp.uint8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nchan * ntile * (ntile + 1) * TILE * TILE
            * 2 * ntime,
            bytes_accessed=(nchan * (ntile + ntile * (ntile + 1) // 2)
                            * ntime * TILE
                            + 8 * nchan * ni * ni),
            transcendentals=0),
    )(packed_cm, packed_cm)
    if pad:
        vr = vr[:, :ninput, :ninput]
        vi = vi[:, :ninput, :ninput]
    return Vis(vr, vi)
