"""Fused X-engine step: end-to-end mini-pipeline vs golden + reference
semantics, driven by the arming state machine (the analog of the
reference's DummySource->Copy->Corr/Beamform mini-pipeline test,
tests/beamformer/beamformer_test.py:31-39)."""

import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.models import xengine
from caltech_bifrost_dsp_tpu.ops import beamform as bf
from caltech_bifrost_dsp_tpu.ops import correlate
from caltech_bifrost_dsp_tpu.ops import corr_subsel as cs
from caltech_bifrost_dsp_tpu.runtime.arming import Action, \
    IntegrationController
from caltech_bifrost_dsp_tpu.verification import golden

CFG = cfgmod.TINY  # nstand=16 nchan=16 gulp=48 acc=240 slow=480


def _run_pipeline(nacc_slow=1):
    """Drive acc_len*k spectra through the fused step gulp by gulp."""
    ntime = CFG.acc_len_slow * nacc_slow
    blocks = golden.generate_input_blocks(ntime, CFG.nchan, CFG.nstand,
                                          CFG.npol, CFG.acc_len)
    state, _, gains, pairs = xengine.default_inputs(CFG)
    fast_ctrl = IntegrationController(CFG.ntime_gulp, CFG.acc_len,
                                      start_time=0)
    slow_ctrl = IntegrationController(CFG.acc_len, CFG.acc_len_slow,
                                      start_time=0, recover_margin=2,
                                      next_boundary_start=False)
    t = 0
    fast_dumps, slow_dumps, subsel_dumps = [], [], []
    slow_dec = None
    for block in blocks:
        packed = block.reshape(CFG.acc_len, CFG.nchan, CFG.ninput)
        for g in range(CFG.acc_len // CFG.ntime_gulp):
            gulp = jnp.asarray(
                packed[g * CFG.ntime_gulp:(g + 1) * CFG.ntime_gulp])
            dec = fast_ctrl.on_gulp(t)
            assert dec.action != Action.SKIP
            if dec.is_first:
                # The slow accumulator consumes completed fast dumps as its
                # input gulps: decide its boundaries per fast accumulation.
                slow_dec = slow_ctrl.on_gulp(dec.seq0)
            state, out = xengine.xengine_step_jit(
                state, gulp, gains, pairs,
                dec.is_first, dec.action == Action.DUMP,
                slow_dec.is_first, CFG)
            if dec.action == Action.DUMP:
                fast_dumps.append(correlate.vis_to_numpy_complex(
                    state.vis_fast))
                subsel_dumps.append(np.asarray(out.subsel.real)
                                    + 1j * np.asarray(out.subsel.imag))
                if slow_dec.action == Action.DUMP:
                    slow_dumps.append(correlate.vis_to_numpy_complex(
                        state.vis_slow))
            t += CFG.ntime_gulp
    return fast_dumps, slow_dumps, subsel_dumps


def test_fast_dumps_match_golden_blocks():
    fast_dumps, slow_dumps, subsel_dumps = _run_pipeline()
    blocks = list(golden.generate_input_blocks(
        CFG.acc_len_slow, CFG.nchan, CFG.nstand, CFG.npol, CFG.acc_len))
    assert len(fast_dumps) == CFG.acc_len_slow // CFG.acc_len
    for dump, block in zip(fast_dumps, blocks):
        ref = golden.reference_correlation(block)
        assert golden.check_vis_against_golden(dump, ref)


def test_slow_dump_is_sum_of_fast_dumps():
    fast_dumps, slow_dumps, _ = _run_pipeline()
    assert len(slow_dumps) == 1
    np.testing.assert_array_equal(slow_dumps[0], sum(fast_dumps))


def test_subsel_output_matches_fast_dump():
    fast_dumps, _, subsel_dumps = _run_pipeline()
    pairs = cs.baselines_to_inputs(
        cs.default_baselines(CFG.nvis_out, CFG.nstand), CFG.npol)
    for dump, sub in zip(fast_dumps, subsel_dumps):
        sel = dump[:, pairs[:, 0], pairs[:, 1]]
        want = sel.reshape(CFG.nchan // CFG.nchan_sum, CFG.nchan_sum,
                           -1).sum(axis=1)
        np.testing.assert_array_equal(sub, want)


def test_step_outputs_shapes():
    state, packed, gains, pairs = xengine.default_inputs(CFG)
    state, out = xengine.xengine_step_jit(state, packed, gains, pairs,
                                          True, True, True, CFG)
    assert out.bf_power.shape == (CFG.nbeam // 2,
                                  CFG.ntime_gulp // CFG.ntime_sum,
                                  CFG.nchan, 4)
    assert out.vlbi.shape == (CFG.ntime_gulp, CFG.nchan, 2, 2)
    assert out.subsel.real.shape == (CFG.nchan // CFG.nchan_sum,
                                     CFG.nvis_out)


def test_subsel_gated_by_sink_and_dump_flag():
    """subsel is skipped (None) when no subsel sink exists, and on
    static mid-window gulps — but the accumulator algebra is unchanged."""
    state, packed, gains, pairs = xengine.default_inputs(CFG)
    st_ref, out_ref = xengine.xengine_step_jit(
        state, packed, gains, pairs, True, True, True, CFG)
    st_no, out_no = xengine.xengine_step_jit(
        state, packed, gains, pairs, True, True, True, CFG,
        want_subsel=False)
    assert out_no.subsel is None
    np.testing.assert_array_equal(np.asarray(st_no.vis_fast.real),
                                  np.asarray(st_ref.vis_fast.real))
    # mid-window (static fast_last=False): gather skipped too
    _, out_mid = xengine.xengine_step_jit(
        state, packed, gains, pairs, True, False, False, CFG)
    assert out_mid.subsel is None


def test_beam_outputs_match_direct_ops(rng):
    state, packed, _, pairs = xengine.default_inputs(CFG)
    g = (rng.standard_normal([CFG.nchan, CFG.nbeam, CFG.ninput])
         + 1j * rng.standard_normal([CFG.nchan, CFG.nbeam, CFG.ninput])
         ).astype(np.complex64)
    gains = bf.BeamGains.from_complex(g)
    _, out = xengine.xengine_step_jit(state, packed, gains, pairs,
                                      True, True, True, CFG)
    beams = bf.beamform_gulp(packed, gains)
    # fused-vs-standalone XLA programs may reassociate f32 sums; gate at
    # the reference tolerance (beamformer_test.py:106-109)
    np.testing.assert_allclose(
        np.asarray(out.bf_power),
        np.asarray(bf.beam_power_sum(beams, CFG.ntime_sum)), rtol=1e-4,
        atol=1e-2)


def test_fx_step_runs_and_feeds_xengine(rng):
    from caltech_bifrost_dsp_tpu.ops import pfb as pfb_ops

    cfg = CFG
    state, _, gains, pairs = xengine.default_inputs(cfg)
    nadc = (cfg.ntime_gulp + cfg.pfb_ntap - 1) * 2 * cfg.nchan
    adc = jnp.asarray(rng.standard_normal([nadc, cfg.ninput])
                      .astype(np.float32) * 4)
    win = jnp.asarray(pfb_ops.pfb_window(cfg.nchan, cfg.pfb_ntap))
    state, out = xengine.fx_step_jit(state, adc, win,
                                     jnp.float32(1.0), gains, pairs,
                                     True, True, True, cfg)
    assert out.bf_power.shape[2] == cfg.nchan
    # autocorrelations are real and non-negative
    dense = correlate.vis_to_numpy_complex(state.vis_fast)
    autos = np.diagonal(dense, axis1=1, axis2=2)
    assert (autos.imag == 0).all() and (autos.real >= 0).all()
