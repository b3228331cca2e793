"""Regressions from the round-4 core review: control-plane robustness
and recovery edge cases in the driver."""

import numpy as np
import pytest

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.control.client import (CorrControlClient,
                                                    PipelineControl)
from caltech_bifrost_dsp_tpu.control.store import MemoryStore
from caltech_bifrost_dsp_tpu.io import sink, source
from caltech_bifrost_dsp_tpu.runtime import driver as drv
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline

CFG = cfgmod.TINY


def test_malformed_beamform_command_does_not_kill_watch_thread():
    """An out-of-range beam_id raises IndexError inside the
    immediate-apply hook, which runs on the store WATCH thread; it must
    be swallowed (recorded as a stat) and later commands must still be
    processed."""
    store = MemoryStore()
    blk = drv.BeamformCommandBlock(CFG, store=store)
    bad = {"type": "calgains", "input_id": 0, "beam_id": 999,
           "data": [1.0, 0.0] * CFG.nchan}
    blk._apply_coeffs({"coeffs": bad})
    assert "last_cmd_error" in blk.stats
    # the block still accepts and applies a good command afterwards
    good = {"type": "calgains", "input_id": 1, "beam_id": 0,
            "data": list(np.tile([2.0, 0.0], CFG.nchan))}
    blk._apply_coeffs({"coeffs": good})
    assert blk.cal_gains[0, 0, 1] == 2.0 + 0j


def test_generic_apply_hook_exception_is_contained():
    """Any exception escaping an immediate-apply hook is caught at the
    CommandBlock layer (the watch thread must survive)."""
    from caltech_bifrost_dsp_tpu.control.command import CommandBlock

    CommandBlock.reset_instance_counts()
    blk = CommandBlock("Boom", store=MemoryStore(),
                       apply_immediately=True)
    blk.define_command_key("x", type=int, initial_val=0)

    def explode(pending):
        raise RuntimeError("hook blew up")

    blk._on_command_applied = explode
    blk._pending_command_vals["x"] = 5
    blk._unapplied_keys.add("x")
    blk.update_command_vals()  # must not raise
    assert blk.stats["last_cmd_error"] == "hook blew up"
    assert blk.command_vals["x"] == 5


def test_load_sample_zero_is_a_valid_schedule():
    """beamcoeffs with an explicit load_sample=0 ("from stream start")
    must load — 0 previously doubled as the idle sentinel and the
    coefficients were silently never applied."""
    blk = drv.BeamformCommandBlock(CFG, store=None)
    nin = CFG.ninput
    blk._apply_coeffs({"coeffs": {
        "type": "beamcoeffs", "beam_id": 1,
        "data": {"delays": [0.0] * nin, "amps": [1.0] * nin},
        "load_sample": 0}})
    assert blk.gains_load_sample[1] == 0
    assert blk.stage_loads(this_gulp_time=0)
    # cal gains default to ones -> active row is now nonzero
    assert np.any(blk.gains_active[:, 1, :] != 0)
    assert blk.gains_load_sample[1] == -2  # idle again
    assert not blk.update_pending


def test_ibeam_throttle_cap_survives_destination_command():
    """Retargeting the VLBI stream must keep IBeamOutput's mandatory
    0.6 Gb/s cap (and its burst block size) even though max_mbps is
    unset (-1); an operator may lower it but never exceed the cap."""
    ib = sink.IBeamOutput(CFG, send=None)
    bb0 = ib.throttle.block_bits
    blk = drv.OutputCommandBlock("BeamformVlbiOutput", ib, store=None)
    blk._pending_command_vals = {"dest_ip": "127.0.0.1"}
    blk._unapplied_keys = {"dest_ip"}
    blk.update_pending = True
    blk.apply_pending()
    assert ib.send is not None
    assert ib.throttle.max_bps == pytest.approx(ib.MAX_BPS)
    assert ib.throttle.block_bits == bb0
    # an operator value above the cap is clamped to it
    blk._pending_command_vals = {"max_mbps": 10_000}
    blk._unapplied_keys = {"max_mbps"}
    blk.update_pending = True
    blk.apply_pending()
    assert ib.throttle.max_bps == pytest.approx(ib.MAX_BPS)
    # below the cap is honored
    blk._pending_command_vals = {"max_mbps": 100}
    blk._unapplied_keys = {"max_mbps"}
    blk.update_pending = True
    blk.apply_pending()
    assert ib.throttle.max_bps == pytest.approx(100e6)


def test_bad_dest_file_disables_sink_instead_of_crashing():
    """dest_file pointing into a missing directory must record an
    apply error and disable the sink — apply_pending runs on the
    output thread, where an escaping OSError wedges the pipeline."""
    out = sink.CorrFullOutput(CFG, send=None)
    blk = drv.OutputCommandBlock("CorrOutputFull", out, store=None)
    blk._pending_command_vals = {"dest_file": "/no/such/dir/x.bin"}
    blk._unapplied_keys = {"dest_file"}
    blk.update_pending = True
    blk.apply_pending()  # must not raise
    assert "last_apply_error" in blk.stats
    assert out.send is None


def test_runtime_fast_acc_change_keeps_slow_dumps_flowing():
    """Doubling the fast acc_len mid-run re-grids the slow
    accumulator's input stream; the slow controller must follow (the
    reference re-reads upstream_acc_len per output sequence) instead
    of waiting forever on off-grid boundaries."""
    store = MemoryStore()
    src = source.DummySource(CFG, mode="random")
    pipe = XEnginePipeline(CFG, src, store=store)
    cli = CorrControlClient(store=store, timeout_s=5.0)
    ctl = PipelineControl(cli, __import__("socket").gethostname(), 0)
    new_acc = 2 * CFG.acc_len          # 480 == acc_len_slow
    ctl.corr.set_acc_length(new_acc)
    ctl.corr.set_start_time(-1)
    ngulp = 8 * CFG.acc_len_slow // CFG.ntime_gulp
    pipe.run(ngulp, timeout_s=180)
    total = ngulp * CFG.ntime_gulp
    # fast starts at the first new_acc boundary; slow windows = 1 fast
    # window each (acc_len_slow == new_acc) and must keep dumping
    want_fast = (total - new_acc) // new_acc
    assert pipe.ndump_fast == want_fast
    assert pipe.ndump_slow >= want_fast - 2
    assert pipe.slow_ctrl.granularity == new_acc


def test_fx_tail_resets_on_sequence_break():
    """After a resync the PFB overlap tail must restart at zero — the
    FIR must not convolve across the gap."""
    cfg = cfgmod.XEngineConfig(
        nstand=8, nchan=16, ntime_gulp=48, acc_len=96, acc_len_slow=96,
        nbeam=2, ntime_sum=12, nchan_sum=4, pfb_ntap=4,
        adc_dtype="int8", pfb_fft_impl="matmul")
    import threading

    gen = source.ADCSource(cfg, mode="tone", tone_chan=3,
                           amplitude=50.0)
    pipe = XEnginePipeline(cfg, gen, fx_mode=True, quant_scale=0.2,
                           batch_accumulations=False)
    g = cfg.ntime_gulp
    gap_start = 10_000 * g
    # recovery start per the margin arithmetic; supply two windows past
    missed = gap_start // cfg.acc_len
    recover = (missed + 10) * cfg.acc_len
    ngulp2 = (recover - gap_start) // g + 2 * (cfg.acc_len // g)

    def ingest():
        seq = pipe.staging.begin_sequence(1, gen.header(seq0=0))
        for i in range(2):
            pipe.staging.write_span(
                seq, gen.gulp(i).view(np.uint8).reshape(g, -1))
        pipe.staging.end_sequence(seq)
        seq2 = pipe.staging.begin_sequence(2, gen.header(seq0=gap_start))
        for i in range(ngulp2):
            pipe.staging.write_span(
                seq2, gen.gulp(7 + i).view(np.uint8).reshape(g, -1))
        pipe.staging.end_sequence(seq2)
        pipe.staging.shutdown()

    tail_seen = {}
    orig = XEnginePipeline._run_step

    def spy(self, block, gains_dev, is_first, is_dump, slow_first):
        tail_seen.setdefault("tails", []).append(
            self._adc_tail.copy())
        return orig(self, block, gains_dev, is_first, is_dump,
                    slow_first)

    XEnginePipeline._run_step = spy
    try:
        threads = [threading.Thread(target=ingest, daemon=True),
                   threading.Thread(target=pipe._compute, daemon=True),
                   threading.Thread(target=pipe._output, daemon=True)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
            assert not t.is_alive()
    finally:
        XEnginePipeline._run_step = orig
    tails = tail_seen["tails"]
    assert len(tails) >= 3
    # second gulp of seq 1 carries a NONZERO tail (overlap continuity)
    assert np.any(tails[1] != 0)
    # first gulp after the break starts from a ZERO tail
    assert not np.any(tails[2])


def test_fx_tail_carry_with_single_tap_stays_empty():
    """pfb_ntap=1 has no overlap: the tail must remain empty, never
    alias the whole previous block (adc[-0:] == adc)."""
    cfg = cfgmod.XEngineConfig(
        nstand=8, nchan=16, ntime_gulp=48, acc_len=96, acc_len_slow=96,
        nbeam=2, ntime_sum=12, nchan_sum=4, pfb_ntap=1,
        adc_dtype="int8", pfb_fft_impl="matmul")
    gen = source.ADCSource(cfg, mode="noise", amplitude=10.0)
    pipe = XEnginePipeline(cfg, gen, fx_mode=True, quant_scale=0.2)
    assert pipe._adc_tail.shape[0] == 0
    adc = gen.gulp(0)
    assert pipe._next_tail(adc).shape[0] == 0
    pipe.run(2, timeout_s=120)
    assert pipe._adc_tail.shape[0] == 0
    assert pipe.ndump_fast == 1
