"""xGPU register-tile order shims vs the reference indexing formulas."""

import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu.ops import correlate, xgpu_order
from caltech_bifrost_dsp_tpu.verification import golden

NSTAND, NPOL, NCHAN, NTIME = 8, 2, 4, 48


def reference_regtile_index(in0, in1, nstand):
    """Scalar transliteration of reference: corr_block.py:37-58."""
    a0 = in0 >> 1
    a1 = in1 >> 1
    p0 = in0 & 1
    p1 = in1 & 1
    quadrant_index = (a1 // 2) * ((a1 // 2) + 1) // 2 + (a0 // 2)
    quadrant = 2 * (a0 & 1) + (a1 & 1)
    quadrant_size = (nstand // 2 + 1) * nstand // 4
    cell_index = quadrant * quadrant_size + quadrant_index
    pol_offset = 2 * p1 + p0
    return cell_index * 4 + pol_offset


def test_regtile_index_matches_reference_formula():
    ninput = NSTAND * NPOL
    for i0 in range(ninput):
        for i1 in range(i0, ninput):
            assert (xgpu_order.regtile_index(i0, i1, NSTAND)
                    == reference_regtile_index(i0, i1, NSTAND))


def test_regtile_indices_unique_and_in_range():
    ninput = NSTAND * NPOL
    idx = [int(xgpu_order.regtile_index(i0, i1, NSTAND))
           for i0 in range(ninput) for i1 in range(i0, ninput)]
    assert len(set(idx)) == len(idx)
    assert max(idx) < xgpu_order.matlen_per_chan(NSTAND, NPOL)


def test_pack_unpack_regtile_roundtrip():
    block = next(golden.generate_input_blocks(NTIME, NCHAN, NSTAND, NPOL,
                                              NTIME))
    vis = correlate.correlate_gulp(
        jnp.asarray(block.reshape(NTIME, NCHAN, NSTAND * NPOL)))
    dense = correlate.vis_to_numpy_complex(vis)
    buf = xgpu_order.pack_regtile(dense)
    assert buf.shape == (2, NCHAN, xgpu_order.matlen_per_chan(NSTAND, NPOL))
    back = xgpu_order.unpack_regtile(buf, NSTAND, NPOL)
    np.testing.assert_array_equal(back, dense)


def test_packed_buffer_holds_first_input_conjugated():
    """xGPU convention: buffer word regtile(i0,i1), i1>=i0, holds
    conj(v_i0)*v_i1 (reference receiver fix-up, corr_full_rx.py:94-99)."""
    block = next(golden.generate_input_blocks(NTIME, NCHAN, NSTAND, NPOL,
                                              NTIME))
    dense = correlate.vis_to_numpy_complex(correlate.correlate_gulp(
        jnp.asarray(block.reshape(NTIME, NCHAN, NSTAND * NPOL))))
    buf = xgpu_order.pack_regtile(dense)
    i0, i1 = 3, 11  # arbitrary off-diagonal pair, i1 > i0
    w = int(xgpu_order.regtile_index(i0, i1, NSTAND))
    got = buf[0, :, w] + 1j * buf[1, :, w]
    np.testing.assert_array_equal(got, np.conj(dense[:, i0, i1]))


def test_baseline_order_maps_natural_order():
    ant_to_input = np.arange(NSTAND * NPOL).reshape(NSTAND, NPOL)
    a2bl, is_conj = xgpu_order.baseline_order_maps(ant_to_input)
    block = next(golden.generate_input_blocks(NTIME, NCHAN, NSTAND, NPOL,
                                              NTIME))
    dense = correlate.vis_to_numpy_complex(correlate.correlate_gulp(
        jnp.asarray(block.reshape(NTIME, NCHAN, NSTAND * NPOL))))
    buf = xgpu_order.pack_regtile(dense)
    # Fetch every (s0,s1,p0,p1) through the maps and compare to golden.
    ref = golden.reference_correlation(block)
    for s0 in range(NSTAND):
        for s1 in range(NSTAND):
            for p0 in range(NPOL):
                for p1 in range(NPOL):
                    w = a2bl[s0, s1, p0, p1]
                    v = buf[0, :, w] + 1j * buf[1, :, w]
                    if is_conj[s0, s1, p0, p1]:
                        v = np.conj(v)
                    np.testing.assert_array_equal(v, ref[:, s0, s1, p0, p1])


def test_baseline_order_maps_permuted_input_order():
    """Arbitrary (stand,pol)->input wiring: the maps must still fetch
    v(s0,p0)*conj(v(s1,p1)) for every pair — the real purpose of
    bfXgpuGetOrder (corr_block.py:317-333)."""
    rng = np.random.RandomState(5)
    ninput = NSTAND * NPOL
    perm = rng.permutation(ninput)
    ant_to_input = perm.reshape(NSTAND, NPOL)
    a2bl, is_conj = xgpu_order.baseline_order_maps(ant_to_input)
    block = next(golden.generate_input_blocks(NTIME, NCHAN, NSTAND, NPOL,
                                              NTIME))
    # physical stream ordered by stand/pol; correlator sees inputs in
    # 'input index' order: input i carries the antpol with
    # ant_to_input[s,p] == i
    phys = block.reshape(NTIME, NCHAN, ninput)
    corr_in = np.empty_like(phys)
    corr_in[:, :, perm] = phys  # input perm[k] carries antpol k
    vis = correlate.correlate_gulp(jnp.asarray(corr_in))
    dense = correlate.vis_to_numpy_complex(vis)
    buf = xgpu_order.pack_regtile(dense)
    ref = golden.reference_correlation(block)
    for s0 in range(NSTAND):
        for s1 in range(NSTAND):
            for p0 in range(NPOL):
                for p1 in range(NPOL):
                    w = a2bl[s0, s1, p0, p1]
                    v = buf[0, :, w] + 1j * buf[1, :, w]
                    if is_conj[s0, s1, p0, p1]:
                        v = np.conj(v)
                    np.testing.assert_array_equal(
                        v, ref[:, s0, s1, p0, p1])


def test_reorder_full_matches_golden():
    block = next(golden.generate_input_blocks(NTIME, NCHAN, NSTAND, NPOL,
                                              NTIME))
    dense = correlate.vis_to_numpy_complex(correlate.correlate_gulp(
        jnp.asarray(block.reshape(NTIME, NCHAN, NSTAND * NPOL))))
    ref = golden.reference_correlation(block)
    out = xgpu_order.reorder_full(dense, NSTAND, NPOL)
    assert out.shape == (NSTAND, NSTAND, NPOL, NPOL, NCHAN, 2)
    z = out[..., 0] + 1j * out[..., 1]
    np.testing.assert_array_equal(z.transpose(4, 0, 1, 2, 3), ref)
