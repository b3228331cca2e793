"""Row-blocked Pallas correlator (DMA double buffering) vs the XLA
path, interpret mode."""

import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu.ops import correlate
from caltech_bifrost_dsp_tpu.ops.pallas import corr_rows
from caltech_bifrost_dsp_tpu.verification import golden

NTIME, NCHAN, NSTAND, NPOL = 64, 3, 160, 2  # ninput=320 -> 3 tiles (pad)


def _packed():
    block = next(golden.generate_input_blocks(NTIME, NCHAN, NSTAND, NPOL,
                                              NTIME))
    return jnp.asarray(block.reshape(NTIME, NCHAN, NSTAND * NPOL))


def test_rows_matches_dense_upper():
    packed = _packed()
    want = correlate.correlate_gulp(packed)
    got = corr_rows.packed_corr_rows(packed, interpret=True)
    ni = NSTAND * NPOL
    iu = np.triu_indices(ni)
    np.testing.assert_array_equal(np.asarray(got.real)[:, iu[0], iu[1]],
                                  np.asarray(want.real)[:, iu[0], iu[1]])
    np.testing.assert_array_equal(np.asarray(got.imag)[:, iu[0], iu[1]],
                                  np.asarray(want.imag)[:, iu[0], iu[1]])


def test_rows_mirror_full():
    packed = _packed()
    want = correlate.correlate_gulp(packed)
    full = corr_rows.mirror_vis(
        corr_rows.packed_corr_rows(packed, interpret=True))
    np.testing.assert_array_equal(np.asarray(full.real),
                                  np.asarray(want.real))
    np.testing.assert_array_equal(np.asarray(full.imag),
                                  np.asarray(want.imag))
