import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu.ops import correlate, corr_subsel
from caltech_bifrost_dsp_tpu.verification import golden

NTIME, NCHAN, NSTAND, NPOL = 48, 8, 8, 2
NCHAN_SUM = 4


def _vis_and_ref():
    block = next(golden.generate_input_blocks(NTIME, NCHAN, NSTAND, NPOL,
                                              NTIME))
    vis = correlate.correlate_gulp(
        jnp.asarray(block.reshape(NTIME, NCHAN, NSTAND * NPOL)))
    return vis, golden.reference_correlation(block)


def test_subsel_gather_and_chansum_exact():
    vis, ref = _vis_and_ref()
    baselines = [[[0, 0], [0, 0]],      # auto, stand 0 pol 0
                 [[5, 1], [6, 0]],      # cross (the docstring example,
                                        # reference: corr_subsel_block.py)
                 [[7, 0], [2, 1]],
                 [[3, 1], [3, 1]]]
    pairs = corr_subsel.baselines_to_inputs(baselines)
    out = corr_subsel.corr_subsel(vis, jnp.asarray(pairs), NCHAN_SUM)
    got = np.asarray(out.real) + 1j * np.asarray(out.imag)
    assert got.shape == (NCHAN // NCHAN_SUM, len(baselines))
    for v, ((s0, p0), (s1, p1)) in enumerate(baselines):
        want_full = ref[:, s0, s1, p0, p1]
        want = want_full.reshape(NCHAN // NCHAN_SUM, NCHAN_SUM).sum(axis=1)
        np.testing.assert_array_equal(got[:, v], want)


def test_default_baselines_shape():
    bl = corr_subsel.default_baselines(4704, NSTAND)
    assert len(bl) == 4704
    pairs = corr_subsel.baselines_to_inputs(bl)
    assert pairs.shape == (4704, 2)
    # all default entries are pol-0 autos
    assert (pairs[:, 0] == pairs[:, 1]).all()


def test_subsel_output_sfreq_reference_arithmetic():
    # Kept bug-compatible with reference: corr_subsel_block.py:268-270
    got = corr_subsel.subsel_output_sfreq(100.0, 80.0, 8, 4)
    chan_width = 80.0 / 8
    assert got == (100.0 + 3 * chan_width) / 4
