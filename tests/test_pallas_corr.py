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
