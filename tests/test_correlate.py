"""Correlator golden-vector gates.

Mirrors the reference's verification strategy: generate seeded golden
inputs + brute-force correlations (reference: verification/
make_golden_inputs.py) and require *exact* integer equality
(reference: corr_output_full_block.py:550-603;
tests/correlator/test_corr_full_rx.py).
"""

import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu.ops import correlate
from caltech_bifrost_dsp_tpu.verification import golden

NTIME, NCHAN, NSTAND, NPOL = 96, 8, 8, 2
GULP = 24


def _golden_block(chanramp=False, ntime=NTIME):
    block = next(golden.generate_input_blocks(
        ntime, NCHAN, NSTAND, NPOL, ntime, chanramp=chanramp))
    ref = golden.reference_correlation(block)
    return block, ref


def test_correlate_gulp_exact_vs_golden():
    block, ref = _golden_block()
    packed = block.reshape(NTIME, NCHAN, NSTAND * NPOL)
    vis = correlate.correlate_gulp(jnp.asarray(packed))
    dense = correlate.vis_to_numpy_complex(vis)
    assert golden.check_vis_against_golden(dense, ref)


def test_correlate_accumulate_scan_matches_single_gulp():
    block, ref = _golden_block()
    packed = jnp.asarray(block.reshape(NTIME, NCHAN, NSTAND * NPOL))
    vis_scan = correlate.correlate_accumulate(packed, GULP)
    dense = correlate.vis_to_numpy_complex(vis_scan)
    assert golden.check_vis_against_golden(dense, ref)


def test_correlate_accumulate_carry_in():
    block, ref = _golden_block()
    packed = jnp.asarray(block.reshape(NTIME, NCHAN, NSTAND * NPOL))
    half = NTIME // 2
    acc = correlate.correlate_accumulate(packed[:half], GULP)
    acc = correlate.correlate_accumulate(packed[half:], GULP, acc=acc)
    dense = correlate.vis_to_numpy_complex(acc)
    assert golden.check_vis_against_golden(dense, ref)


def test_correlate_chanramp_vectors():
    block, ref = _golden_block(chanramp=True)
    packed = jnp.asarray(np.ascontiguousarray(
        block.reshape(NTIME, NCHAN, NSTAND * NPOL)))
    vis = correlate.correlate_gulp(packed)
    dense = correlate.vis_to_numpy_complex(vis)
    assert golden.check_vis_against_golden(dense, ref)


def test_hermitian_symmetry():
    block, _ = _golden_block()
    packed = jnp.asarray(block.reshape(NTIME, NCHAN, NSTAND * NPOL))
    dense = correlate.vis_to_numpy_complex(correlate.correlate_gulp(packed))
    np.testing.assert_array_equal(dense,
                                  np.conj(np.swapaxes(dense, 1, 2)))


def test_long_accumulate():
    block, ref = _golden_block()
    packed = jnp.asarray(block.reshape(NTIME, NCHAN, NSTAND * NPOL))
    v1 = correlate.correlate_gulp(packed[:GULP])
    v2 = correlate.correlate_gulp(packed[GULP:2 * GULP])
    acc = correlate.long_accumulate(v2, v1)
    direct = correlate.correlate_gulp(packed[:2 * GULP])
    np.testing.assert_array_equal(np.asarray(acc.real),
                                  np.asarray(direct.real))
    np.testing.assert_array_equal(np.asarray(acc.imag),
                                  np.asarray(direct.imag))


def test_golden_file_roundtrip(tmp_path):
    acc = 48
    in_path = golden.input_filename(tmp_path, NTIME, NCHAN, NSTAND, NPOL)
    corr_path = golden.corr_filename(tmp_path, NTIME, acc, NCHAN, NSTAND,
                                     NPOL)
    golden.write_input_file(in_path, NTIME, NCHAN, NSTAND, NPOL, acc)
    golden.write_corr_file(corr_path, NTIME, NCHAN, NSTAND, NPOL, acc)
    meta_in, din = golden.read_dat(in_path)
    meta_corr, dcorr = golden.read_dat(corr_path)
    assert meta_in["shape"] == [NTIME, NCHAN, NSTAND, NPOL]
    assert meta_corr["acc_len"] == acc
    # Each stored correlation block must equal the brute-force correlation
    # of the corresponding input block, and the TPU correlator must match.
    for t in range(NTIME // acc):
        blk = din[t * acc:(t + 1) * acc]
        np.testing.assert_array_equal(
            dcorr[t], golden.reference_correlation(blk))
        vis = correlate.correlate_gulp(
            jnp.asarray(blk.reshape(acc, NCHAN, NSTAND * NPOL)))
        assert golden.check_vis_against_golden(
            correlate.vis_to_numpy_complex(vis), dcorr[t])
