"""Pallas TPU kernel: 256-block triangular correlator, int8 Karatsuba.

Third-generation correlator kernel (v1 pair-grid :mod:`.corr_triu`, v2
row-streamed :mod:`.corr_rows`).  What round-3 kernel experiments on
v5e established:

- int8 ``dot_general`` with an int32 accumulator compiles natively in
  Mosaic and runs at ~bf16 rate; int8 *operands* still beat bf16 ones
  (half the VMEM footprint pipelines better): 13.1 vs 14.8 ms
  standalone at the production shape.
- 256x256 output blocks beat 128x128 tiles (13.1 vs 16.1 ms): four
  128x128 MXU tiles per dot amortize the per-instance overhead.
- The imaginary part comes from ONE extra product via Karatsuba:
  ``P3 = (ai - ar) @ (br + bi)``; ``vi = P3 + P1 - P2`` with
  ``P1 = ar@br``, ``P2 = ai@bi`` — 3 dots instead of 4.  The combo
  planes are derived in int32 lanes during the 4-bit unpack (int8
  vector add/sub is Mosaic-rejected) and fit int8 exactly
  (``ai-ar`` in [-15,15], ``br+bi`` in [-16,14]).
- Exactness: 4-bit products bound every partial sum well below 2^31
  for any realistic window, so int32 accumulation is exact and the
  outputs are bit-identical to the dense XLA engine (gated by
  tests/test_xengine_blk.py).

Replaces xGPU's register-tile triangular X-engine
(reference: install_xgpu.sh:5, blocks/corr_block.py:445) as the hot
correlator: only ``j >= i`` 256-blocks are computed (6 of 9 for 704
inputs); consumers use :func:`mirror_vis` (per dump) or the
upper-triangle subselection gather which needs no mirror.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.correlate import Vis
from .corr_triu import mirror_vis  # noqa: F401  (shared consumer API)

BLK = 256


def _blocks(nblk: int) -> np.ndarray:
    return np.array([(i, j) for i in range(nblk)
                     for j in range(i, nblk)], dtype=np.int32)


def _kernel(bi_ref, bj_ref, a_ref, b_ref, vr_ref, vi_ref):
    """One (chan, block-pair) instance: unpack + 3 int8 dots."""
    a32 = a_ref[0].astype(jnp.int32)
    b32 = b_ref[0].astype(jnp.int32)
    # 4+4-bit sign extension ((v ^ 8) - 8) in int32 lanes; the
    # Karatsuba combination planes are formed here too, before the
    # int8 cast (int8 vector arithmetic is Mosaic-rejected).
    arw = ((a32 >> 4) ^ 8) - 8
    aiw = ((a32 & 0xF) ^ 8) - 8
    brw = ((b32 >> 4) ^ 8) - 8
    biw = ((b32 & 0xF) ^ 8) - 8
    ar, ai = arw.astype(jnp.int8), aiw.astype(jnp.int8)
    br, bi = brw.astype(jnp.int8), biw.astype(jnp.int8)
    ad = (aiw - arw).astype(jnp.int8)
    bs = (brw + biw).astype(jnp.int8)

    dn = (((0,), (0,)), ((), ()))

    def dot(x, y):
        return jax.lax.dot_general(x, y, dimension_numbers=dn,
                                   preferred_element_type=jnp.int32)

    p1 = dot(ar, br)
    p2 = dot(ai, bi)
    p3 = dot(ad, bs)
    vr_ref[0] = p1 + p2
    vi_ref[0] = p3 + p1 - p2


@functools.partial(jax.jit, static_argnames=("interpret",))
def packed_corr_blk(packed: jax.Array, interpret: bool = False) -> Vis:
    """Correlate a packed block, computing only ``j >= i`` 256-blocks.

    Args:
      packed: uint8 [ntime, nchan, ninput].

    Returns:
      int32 Vis [nchan, ninput, ninput]; entries whose 256-block
      satisfies ``blk(j) >= blk(i)`` are valid (a superset of the upper
      triangle), the rest are unspecified (zero).  Use
      :func:`mirror_vis` for the full Hermitian matrix.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntime, nchan, ninput = packed.shape
    pad = (-ninput) % BLK
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, pad)))
    ni = ninput + pad
    nblk = ni // BLK
    pairs = _blocks(nblk)
    npair = len(pairs)
    bi = jnp.asarray(pairs[:, 0])
    bj = jnp.asarray(pairs[:, 1])
    packed_cm = jnp.transpose(packed, (1, 0, 2))  # [C, T, I]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchan, npair),
        in_specs=[
            pl.BlockSpec((1, ntime, BLK),
                         lambda c, k, bi, bj: (c, 0, bi[k])),
            pl.BlockSpec((1, ntime, BLK),
                         lambda c, k, bi, bj: (c, 0, bj[k])),
        ],
        out_specs=[
            pl.BlockSpec((1, BLK, BLK),
                         lambda c, k, bi, bj: (c, bi[k], bj[k])),
            pl.BlockSpec((1, BLK, BLK),
                         lambda c, k, bi, bj: (c, bi[k], bj[k])),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((nchan, ni, ni), jnp.int32)] * 2
    vr, vi = pl.pallas_call(
        _kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * nchan * npair * BLK * BLK * 3 * ntime,
            bytes_accessed=(2 * nchan * npair * ntime * BLK
                            + 8 * nchan * npair * BLK * BLK),
            transcendentals=0),
    )(bi, bj, packed_cm, packed_cm)
    if pad:
        vr = vr[:, :ninput, :ninput]
        vi = vi[:, :ninput, :ninput]
    return Vis(vr, vi)
