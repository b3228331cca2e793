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


# ---- block/band-compacted engine coverage (ADVICE r3: the bands engine
# branches must be exercised at widths where the static guards do NOT
# fall back: ni > 256, plus the 128-unaligned 704 width of the XLA
# correlator engine) -------------------------------------------------------

import jax

from caltech_bifrost_dsp_tpu.ops.correlate import Vis


def _rand_vis(rng, nchan, ni):
    return Vis(
        jnp.asarray(rng.randint(-(1 << 20), 1 << 20, [nchan, ni, ni])
                    .astype(np.int32)),
        jnp.asarray(rng.randint(-(1 << 20), 1 << 20, [nchan, ni, ni])
                    .astype(np.int32)))


def _band_counts(pairs, ni):
    p = np.asarray(pairs)
    lo = np.minimum(p[:, 0], p[:, 1]).clip(0, ni - 1)
    hi = np.maximum(p[:, 0], p[:, 1]).clip(0, ni - 1)
    return len(np.unique(lo // 8)), len(np.unique(hi // 128))


def _assert_bands_matches_flat(rng, ni, pairs, nchan=8, nchan_sum=4):
    vis = _rand_vis(rng, nchan, ni)
    ref = corr_subsel.corr_subsel(vis, pairs, nchan_sum)
    got = corr_subsel.corr_subsel_bands(vis, pairs, nchan_sum,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(got.real),
                                  np.asarray(ref.real))
    np.testing.assert_array_equal(np.asarray(got.imag),
                                  np.asarray(ref.imag))


def test_bands_engine_2d_blocks_branch_ni512(rng):
    """Sparse production-like selection at ni=512: fits both the row
    and column budgets, so the 2-D block-slab branch executes."""
    ni = 512
    pairs = jnp.asarray(rng.randint(0, 96, [600, 2]).astype(np.int32))
    nr, nc = _band_counts(pairs, ni)
    assert nr <= 16 and nc <= 2      # precondition: 2-D branch taken
    # (16 = corr_subsel_bands' default row-band budget)
    _assert_bands_matches_flat(rng, ni, pairs)


def test_bands_engine_rows_branch_ni512(rng):
    """Rows fit but columns exceed the col budget: the row-band slab
    branch executes (cond's 2-D test is False, rows test True)."""
    ni = 512
    lo = rng.randint(0, 64, 600).astype(np.int32)
    hi = (lo + rng.randint(0, ni - 64, 600)).astype(np.int32)
    pairs = jnp.asarray(np.stack([lo, hi], axis=1))
    nr, nc = _band_counts(pairs, ni)
    assert nr <= 16 and nc > 2       # precondition: rows branch taken
    _assert_bands_matches_flat(rng, ni, pairs)


def test_bands_engine_flat_fallback_ni512(rng):
    """Band-dense selection (touches every stand, like the
    autos-cycling default): both slab branches reject and the in-graph
    flat take() fallback executes."""
    ni = 512
    pairs = jnp.asarray(rng.randint(0, ni, [600, 2]).astype(np.int32))
    nr, _ = _band_counts(pairs, ni)
    assert nr > 32                   # precondition: flat branch taken
    _assert_bands_matches_flat(rng, ni, pairs)


def test_bands_engine_production_selection_ni768(rng):
    """The real production selection (4704 = all pol pairs among the
    first 48 stands) on the block engine's 768-padded width: 12
    row-bands x 1 column-tile -> the 2-D branch."""
    ni = 768
    pairs = jnp.asarray(corr_subsel.baselines_to_inputs(
        corr_subsel.production_baselines(4704, 352)).astype(np.int32))
    nr, nc = _band_counts(pairs, ni)
    assert nr == 12 and nc == 1
    _assert_bands_matches_flat(rng, ni, pairs, nchan=8)


def test_bands_engine_unaligned_width_ni704(rng):
    """The XLA correlator engine's unpadded 704-input matrix: 704 % 128
    != 0 disables the 2-D branch; the row-band slab (704 % 8 == 0)
    still engages and must stay exact on the non-lane-aligned width."""
    ni = 704
    pairs = jnp.asarray(rng.randint(0, 96, [600, 2]).astype(np.int32))
    _assert_bands_matches_flat(rng, ni, pairs)


def test_bands_engine_oob_pairs_match_flat(rng):
    """Out-of-range pairs clamp identically on every branch."""
    ni = 512
    pairs = jnp.asarray(rng.randint(0, 2 * ni, [128, 2])
                        .astype(np.int32))
    _assert_bands_matches_flat(rng, ni, pairs)


def test_production_baselines_shape_and_fallback():
    bl = corr_subsel.production_baselines(4704, 352)
    assert len(bl) == 4704
    pairs = corr_subsel.baselines_to_inputs(bl)
    # spans exactly the first 48 stands' 96 inputs
    assert pairs.max() == 95 and pairs.min() == 0
    # configs too small for the triangle fall back to the default
    assert (corr_subsel.production_baselines(4704, 16)
            == corr_subsel.default_baselines(4704, 16))


def test_step_clamps_pairs_to_real_ninput(rng):
    """A malformed runtime selection (stand >= nstand) must gather a
    REAL input's visibility, not the block engine's don't-care pad rows
    (ADVICE r3): the step clamps to ninput-1 before engine dispatch."""
    from caltech_bifrost_dsp_tpu import config as cfgmod
    from caltech_bifrost_dsp_tpu.models import xengine

    cfg = cfgmod.TINY.replace(corr_engine="pallas_blk",
                              subsel_engine="bands")
    state, packed, gains, _ = xengine.default_inputs(cfg)
    bad = jnp.full((16, 2), 10_000, jnp.int32)    # way out of range
    clamped = jnp.full((16, 2), cfg.ninput - 1, jnp.int32)
    _, out_bad = xengine.xengine_step_jit(state, packed, gains, bad,
                                          True, True, False, cfg)
    _, out_ok = xengine.xengine_step_jit(state, packed, gains, clamped,
                                         True, True, False, cfg)
    np.testing.assert_array_equal(np.asarray(out_bad.subsel.real),
                                  np.asarray(out_ok.subsel.real))
    np.testing.assert_array_equal(np.asarray(out_bad.subsel.imag),
                                  np.asarray(out_ok.subsel.imag))
