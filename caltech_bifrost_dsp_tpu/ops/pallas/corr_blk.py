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


def padded_ni(ninput: int) -> int:
    """Input count padded to the block size (the accumulator width the
    fused step carries when this engine is active — keeping the state
    padded avoids a pad+slice HBM round trip on every window)."""
    return ninput + (-ninput) % BLK


def _blocks(nblk: int) -> np.ndarray:
    return np.array([(i, j) for i in range(nblk)
                     for j in range(i, nblk)], dtype=np.int32)


def _kernel(bi_ref, bj_ref, a_ref, b_ref, vr_ref, vi_ref):
    """One (chan, block-pair) instance: unpack + 3 int8 dots."""
    vr, vi = _dot3(*_unpack_planes(a_ref[0].astype(jnp.int32),
                                   b_ref[0].astype(jnp.int32)))
    vr_ref[0] = vr
    vi_ref[0] = vi


def _unpack_planes(a32, b32):
    """int32-lane 4-bit unpack + Karatsuba combination planes."""
    arw = ((a32 >> 4) ^ 8) - 8
    aiw = ((a32 & 0xF) ^ 8) - 8
    brw = ((b32 >> 4) ^ 8) - 8
    biw = ((b32 & 0xF) ^ 8) - 8
    return (arw.astype(jnp.int8), aiw.astype(jnp.int8),
            brw.astype(jnp.int8), biw.astype(jnp.int8),
            (aiw - arw).astype(jnp.int8), (brw + biw).astype(jnp.int8))


def _dot3(ar, ai, br, bi, ad, bs):
    dn = (((0,), (0,)), ((), ()))

    def dot(x, y):
        return jax.lax.dot_general(x, y, dimension_numbers=dn,
                                   preferred_element_type=jnp.int32)

    p1 = dot(ar, br)
    p2 = dot(ai, bi)
    p3 = dot(ad, bs)
    return p1 + p2, p3 + p1 - p2


def _to_chan_major(packed: jax.Array, layout: str) -> jax.Array:
    """[C, T, padded_ni] chan-major operand from either layout.

    ``layout="tci"`` is the wire/staging order ([time, chan, input],
    the reference's capture-ring layout, capture_block.py:262-292) and
    pays an XLA pad+transpose (~2.3 ms at production shape).
    ``layout="cti"`` is the TPU-native staging order: the caller
    provides [chan, time, ninput-or-padded] and the kernels read it
    directly — measured 5.60 ms correlator (98% of the MXU roofline)
    vs 7.55 ms with the prologue.  When the input arrives already at
    the 256-padded width the pad lanes are DON'T-CARE bytes (any
    garbage nibble stays in [-8, 7], so the Karatsuba combination
    planes cannot overflow int8, and every product involving a pad
    lane lands in vis rows/cols >= ninput, which dense_vis() slices
    away; zero-gain rows kill them in the beamformer)."""
    if layout == "cti":
        nchan, ntime, ni_in = packed.shape
        ni = padded_ni(ni_in)
        if ni != ni_in:
            packed = jnp.pad(packed, ((0, 0), (0, 0), (0, ni - ni_in)))
        return packed
    if layout != "tci":
        raise ValueError(f"unknown layout {layout!r}")
    ntime, nchan, ninput = packed.shape
    ni = padded_ni(ninput)
    if ni != ninput:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, ni - ninput)))
    return jnp.transpose(packed, (1, 0, 2))


@functools.partial(jax.jit, static_argnames=("fast_first", "fast_last",
                                             "slow_first", "layout",
                                             "unpack_cache",
                                             "interpret"))
def packed_corr_blk_acc(packed: jax.Array,
                        fast_in: Vis | None,
                        slow_in: Vis | None,
                        fast_first: bool, fast_last: bool,
                        slow_first: bool,
                        layout: str = "tci",
                        unpack_cache: bool | None = None,
                        interpret: bool = False) -> tuple[Vis, Vis]:
    """Correlate one gulp AND apply the accumulator algebra in-kernel.

    Replaces the fused step's XLA full-cube adds (the reference's
    ``BFMap("a += b")`` long accumulate, corr_acc_block.py:304-306, and
    the per-gulp fast accumulate) with per-block epilogues on the
    256-block triangular layout — the adds ride the visibility tiles
    already resident in VMEM instead of a separate 2.3 GB HBM pass.

    Args:
      packed: uint8 [ntime, nchan, ninput].
      fast_in: padded Vis [nchan, padded_ni, padded_ni] carried fast
        accumulator (ignored when ``fast_first``).
      slow_in: padded Vis slow accumulator (read only when ``fast_last
        and not slow_first``).
      flags: the reference's integration-boundary semantics
        (corr_block.py:433-445, corr_acc_block.py:303-306), static.

    Returns:
      (fast, slow) padded Vis:
        fast = gulp            if fast_first else fast_in + gulp
        slow = slow_in         if not fast_last
             = fast            if slow_first
             = slow_in + fast  otherwise
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    packed_cm = _to_chan_major(packed, layout)
    nchan, ntime, ni = packed_cm.shape
    nblk = ni // BLK
    pairs = _blocks(nblk)
    npair = len(pairs)
    bi = jnp.asarray(pairs[:, 0])
    bj = jnp.asarray(pairs[:, 1])

    add_fast = not fast_first
    add_slow = fast_last and not slow_first
    if add_fast and (fast_in is None or fast_in.real.shape[1] != ni):
        raise ValueError("fast_in must be a padded Vis")
    if add_slow and (slow_in is None or slow_in.real.shape[1] != ni):
        raise ValueError("slow_in must be a padded Vis")

    if unpack_cache is None:
        # Measured NEGATIVE at the production shape (r4, bench.py):
        # 284.7 Gb/s cached vs 375.9 uncached.  The 4-plane int8 cache
        # (56 MB at cb=8) exceeds the 128 MB VMEM budget, forcing the
        # channel blocking down to cb=4, which costs more per-instance
        # overhead than the ~4x unpack reduction saves; cb=6 compiles
        # 0.5 MB over the scoped-vmem limit and cb=8 spills 38 MB of
        # registers.  Kept (with CBD_CORR_CACHE_CB for experiments)
        # because the trade flips if a future chip generation widens
        # VMEM.  Output is bit-identical either way
        # (tests/test_xengine_blk.py runs both).
        unpack_cache = False
    nout = 4 if (add_slow or (fast_last and slow_first)) else 2
    if unpack_cache:
        return _corr_blk_acc_cached(packed_cm, fast_in, slow_in,
                                    add_fast, add_slow, fast_last,
                                    slow_first, nout, interpret)

    # channels per instance: amortizes block DMA + per-instance
    # overhead across the channel axis (measured 10.7 -> 10.15 ms at
    # cb=8, production shape)
    cb = 1
    for cand in (8, 6, 4, 3, 2):
        if nchan % cand == 0:
            cb = cand
            break

    def kernel(bi_ref, bj_ref, *refs):
        it = iter(refs)
        a_ref = next(it)
        b_ref = next(it)
        fr_in = fi_in = sr_in = si_in = None
        if add_fast:
            fr_in, fi_in = next(it), next(it)
        if add_slow:
            sr_in, si_in = next(it), next(it)
        fr_out, fi_out = next(it), next(it)
        if add_slow or (fast_last and slow_first):
            sr_out, si_out = next(it), next(it)
        for ci in range(cb):
            vr, vi = _dot3(*_unpack_planes(a_ref[ci].astype(jnp.int32),
                                           b_ref[ci].astype(jnp.int32)))
            if add_fast:
                vr = vr + fr_in[ci]
                vi = vi + fi_in[ci]
            fr_out[ci] = vr
            fi_out[ci] = vi
            if add_slow:
                sr_out[ci] = sr_in[ci] + vr
                si_out[ci] = si_in[ci] + vi
            elif fast_last and slow_first:
                sr_out[ci] = vr
                si_out[ci] = vi

    blk_in = [
        pl.BlockSpec((cb, ntime, BLK), lambda c, k, bi, bj: (c, 0, bi[k])),
        pl.BlockSpec((cb, ntime, BLK), lambda c, k, bi, bj: (c, 0, bj[k])),
    ]
    vspec = pl.BlockSpec((cb, BLK, BLK),
                         lambda c, k, bi, bj: (c, bi[k], bj[k]))
    operands = [packed_cm, packed_cm]
    if add_fast:
        blk_in += [vspec, vspec]
        operands += [fast_in.real, fast_in.imag]
    if add_slow:
        blk_in += [vspec, vspec]
        operands += [slow_in.real, slow_in.imag]
    nout = 4 if (add_slow or (fast_last and slow_first)) else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchan // cb, npair),
        in_specs=blk_in,
        out_specs=[vspec] * nout,
    )
    out_shape = [jax.ShapeDtypeStruct((nchan, ni, ni), jnp.int32)] * nout
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * nchan * npair * BLK * BLK * 3 * ntime,
            bytes_accessed=(2 * nchan * npair * ntime * BLK
                            + 4 * (2 + nout) * nchan * npair * BLK * BLK),
            transcendentals=0),
    )(bi, bj, *operands)
    fast = Vis(outs[0], outs[1])
    if nout == 4:
        slow = Vis(outs[2], outs[3])
    else:
        slow = slow_in if slow_in is not None else fast
    return fast, slow


def _corr_blk_acc_cached(packed_cm: jax.Array,
                         fast_in: Vis | None, slow_in: Vis | None,
                         add_fast: bool, add_slow: bool,
                         fast_last: bool, slow_first: bool,
                         nout: int, interpret: bool) -> tuple[Vis, Vis]:
    """Unpack-once variant of the accumulator kernel.

    The pair-grid kernel re-derives the int8 Karatsuba planes of every
    256-block once per PAIR it participates in (~4x per block at 704
    inputs), and that in-kernel unpack chain is the measured residual
    between the kernel (7.6 ms) and its 3-dot MXU roofline (5.5 ms).
    Here each channel-group's whole input row stays VMEM-resident
    (block index constant across the pair axis) and the first pair
    instance unpacks ALL blocks into a VMEM scratch cache — four int8
    planes per block: re, im, and both Karatsuba combination planes
    (im-re for the A side, re+im for the B side) — which every
    subsequent pair reads directly.  VPU unpack work drops ~4x; the
    MXU dots and the fused accumulator epilogue are unchanged, so the
    output is bit-identical."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nchan, ntime, ni = packed_cm.shape
    nblk = ni // BLK
    pairs = _blocks(nblk)
    npair = len(pairs)
    bi = jnp.asarray(pairs[:, 0])
    bj = jnp.asarray(pairs[:, 1])

    # channel-group size bounded by the VMEM budget: cached planes
    # (4 int8 planes x nblk blocks) + the resident input row (x2 for
    # the pipeline's next-group prefetch) + the int32 accumulator
    # tiles in flight
    nin_v = 2 * (1 if add_fast else 0) + 2 * (1 if add_slow else 0)
    import os as _os

    cb_env = int(_os.environ.get("CBD_CORR_CACHE_CB", "0"))
    cb = 1
    for cand in (8, 6, 4, 3, 2):
        if nchan % cand:
            continue
        budget = (4 * nblk * cand * ntime * BLK
                  + 2 * cand * ntime * ni
                  + 2 * (nin_v + nout) * cand * BLK * BLK * 4)
        if budget <= 80 * 1024 * 1024:
            cb = cand
            break
    if cb_env and nchan % cb_env == 0:
        cb = cb_env

    def kernel(bi_ref, bj_ref, *refs):
        it = iter(refs)
        x_ref = next(it)
        fr_in = fi_in = sr_in = si_in = None
        if add_fast:
            fr_in, fi_in = next(it), next(it)
        if add_slow:
            sr_in, si_in = next(it), next(it)
        fr_out, fi_out = next(it), next(it)
        if nout == 4:
            sr_out, si_out = next(it), next(it)
        cache = next(it)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            for b in range(nblk):
                x32 = x_ref[:, :, b * BLK:(b + 1) * BLK].astype(
                    jnp.int32)
                r = ((x32 >> 4) ^ 8) - 8
                q = ((x32 & 0xF) ^ 8) - 8
                cache[0, b] = r.astype(jnp.int8)
                cache[1, b] = q.astype(jnp.int8)
                cache[2, b] = (q - r).astype(jnp.int8)  # A-side combo
                cache[3, b] = (r + q).astype(jnp.int8)  # B-side combo

        i_blk = bi_ref[k]
        j_blk = bj_ref[k]
        for ci in range(cb):
            vr, vi = _dot3(cache[0, i_blk, ci], cache[1, i_blk, ci],
                           cache[0, j_blk, ci], cache[1, j_blk, ci],
                           cache[2, i_blk, ci], cache[3, j_blk, ci])
            if add_fast:
                vr = vr + fr_in[ci]
                vi = vi + fi_in[ci]
            fr_out[ci] = vr
            fi_out[ci] = vi
            if add_slow:
                sr_out[ci] = sr_in[ci] + vr
                si_out[ci] = si_in[ci] + vi
            elif fast_last and slow_first:
                sr_out[ci] = vr
                si_out[ci] = vi

    vspec = pl.BlockSpec((cb, BLK, BLK),
                         lambda c, k, bi, bj: (c, bi[k], bj[k]))
    blk_in = [pl.BlockSpec((cb, ntime, ni),
                           lambda c, k, bi, bj: (c, 0, 0))]
    operands = [packed_cm]
    if add_fast:
        blk_in += [vspec, vspec]
        operands += [fast_in.real, fast_in.imag]
    if add_slow:
        blk_in += [vspec, vspec]
        operands += [slow_in.real, slow_in.imag]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchan // cb, npair),
        in_specs=blk_in,
        out_specs=[vspec] * nout,
        scratch_shapes=[
            pltpu.VMEM((4, nblk, cb, ntime, BLK), jnp.int8)],
    )
    out_shape = [jax.ShapeDtypeStruct((nchan, ni, ni), jnp.int32)] * nout
    outs = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * nchan * npair * BLK * BLK * 3 * ntime,
            bytes_accessed=(nchan * ntime * ni
                            + 4 * (2 + nout) * nchan * npair * BLK * BLK),
            transcendentals=0),
    )(bi, bj, *operands)
    fast = Vis(outs[0], outs[1])
    if nout == 4:
        slow = Vis(outs[2], outs[3])
    else:
        slow = slow_in if slow_in is not None else fast
    return fast, slow


@functools.partial(jax.jit, static_argnames=("interpret", "slice_out",
                                             "layout"))
def packed_corr_blk(packed: jax.Array, interpret: bool = False,
                    slice_out: bool = True, layout: str = "tci") -> Vis:
    """Correlate a packed block, computing only ``j >= i`` 256-blocks.

    Args:
      packed: uint8 [ntime, nchan, ninput] (``layout="tci"``) or
        [nchan, ntime, ninput|padded_ni] (``layout="cti"``, see
        :func:`_to_chan_major`).
      slice_out: slice the padded result back to ninput (False keeps
        the padded width for callers carrying padded accumulators).

    Returns:
      int32 Vis [nchan, ninput, ninput]; entries whose 256-block
      satisfies ``blk(j) >= blk(i)`` are valid (a superset of the upper
      triangle), the rest are unspecified (zero).  Use
      :func:`mirror_vis` for the full Hermitian matrix.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ninput = packed.shape[2]
    packed_cm = _to_chan_major(packed, layout)
    nchan, ntime, ni = packed_cm.shape
    pad = ni - ninput
    nblk = ni // BLK
    pairs = _blocks(nblk)
    npair = len(pairs)
    bi = jnp.asarray(pairs[:, 0])
    bj = jnp.asarray(pairs[:, 1])

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
    if pad and slice_out:
        vr = vr[:, :ninput, :ninput]
        vi = vi[:, :ninput, :ninput]
    return Vis(vr, vi)
