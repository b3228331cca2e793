"""Pallas triangular correlator kernel vs the XLA path (interpret mode
on the CPU test backend; compiled on real TPU via bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from caltech_bifrost_dsp_tpu.ops import correlate
from caltech_bifrost_dsp_tpu.ops.pallas import corr_triu
from caltech_bifrost_dsp_tpu.verification import golden

NTIME, NCHAN, NSTAND, NPOL = 96, 4, 80, 2  # ninput=160 -> 2 tiles (pad)


def _packed():
    block = next(golden.generate_input_blocks(NTIME, NCHAN, NSTAND, NPOL,
                                              NTIME))
    return jnp.asarray(block.reshape(NTIME, NCHAN, NSTAND * NPOL))


def test_triu_matches_dense_upper():
    packed = _packed()
    want = correlate.correlate_gulp(packed)
    got = corr_triu.packed_corr_triu(packed, interpret=True)
    ni = NSTAND * NPOL
    iu = np.triu_indices(ni)
    np.testing.assert_array_equal(np.asarray(got.real)[:, iu[0], iu[1]],
                                  np.asarray(want.real)[:, iu[0], iu[1]])
    np.testing.assert_array_equal(np.asarray(got.imag)[:, iu[0], iu[1]],
                                  np.asarray(want.imag)[:, iu[0], iu[1]])


def test_mirror_reconstructs_full_matrix():
    packed = _packed()
    want = correlate.correlate_gulp(packed)
    triu = corr_triu.packed_corr_triu(packed, interpret=True)
    full = corr_triu.mirror_vis(triu)
    np.testing.assert_array_equal(np.asarray(full.real),
                                  np.asarray(want.real))
    np.testing.assert_array_equal(np.asarray(full.imag),
                                  np.asarray(want.imag))


def test_tile_pairs_cover_upper_triangle():
    pairs = corr_triu._tile_pairs(6)
    assert len(pairs) == 21
    assert all(j >= i for i, j in pairs)


def test_blk_acc_unpack_cache_bit_identical(rng):
    """The unpack-once cached variant (kept for wider-VMEM chips;
    measured slower on v5e — see corr_blk.py) must stay bit-identical
    to the production uncached kernel, including the fused fast/slow
    accumulator epilogues."""
    import jax.numpy as jnp

    from caltech_bifrost_dsp_tpu.ops.correlate import Vis
    from caltech_bifrost_dsp_tpu.ops.pallas import corr_blk

    C, T, NI = 4, 48, 512   # 2 blocks -> 3 pairs; cache holds 2 blocks
    packed = jnp.asarray(rng.randint(0, 255, [C, T, NI])
                         .astype(np.uint8))
    slow = Vis(
        jnp.asarray(rng.randint(-1000, 1000, [C, NI, NI])
                    .astype(np.int32)),
        jnp.asarray(rng.randint(-1000, 1000, [C, NI, NI])
                    .astype(np.int32)))
    outs = {}
    for cache in (False, True):
        fast, sl = corr_blk.packed_corr_blk_acc(
            packed, None, slow, True, True, False, layout="cti",
            unpack_cache=cache, interpret=True)
        outs[cache] = (fast, sl)
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(np.asarray(a.real),
                                      np.asarray(b.real))
        np.testing.assert_array_equal(np.asarray(a.imag),
                                      np.asarray(b.imag))
