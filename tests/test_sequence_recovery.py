"""End-to-end sequence-break recovery: after an upstream discontinuity
(packet loss / timestamp jump) the pipeline re-arms at
last_start + (missed+margin)*acc_len and keeps integrating — the
reference's core recovery invariant (corr_block.py:360-372)."""

import threading

import numpy as np

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.io import source
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline

CFG = cfgmod.TINY  # gulp 48, acc 240, slow 480


def test_pipeline_recovers_after_sequence_break():
    src = source.DummySource(CFG, mode="random")
    pipe = XEnginePipeline(CFG, src, autostartat=0)

    g = CFG.ntime_gulp
    nacc_gulps = CFG.acc_len // g

    def ingest():
        # sequence 1: exactly one full accumulation starting at 0
        seq = pipe.staging.begin_sequence(1, src.header(seq0=0))
        for i in range(nacc_gulps):
            pipe.staging.write_span(seq, src.gulp(i))
        pipe.staging.end_sequence(seq)
        # gap: stream resumes far in the future
        gap_start = 10_000 * g
        seq2 = pipe.staging.begin_sequence(2, src.header(seq0=gap_start))
        # recovery start = 0 + (missed//acc + 10) * acc
        missed_accs = gap_start // CFG.acc_len
        recover = (missed_accs + 10) * CFG.acc_len
        ngulp2 = (recover - gap_start) // g + 2 * nacc_gulps
        for i in range(ngulp2):
            pipe.staging.write_span(seq2, src.gulp(i))
        pipe.staging.end_sequence(seq2)
        pipe.staging.shutdown()

    threads = [threading.Thread(target=ingest, daemon=True),
               threading.Thread(target=pipe._compute, daemon=True),
               threading.Thread(target=pipe._output, daemon=True)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive()

    # 1 dump before the break + 2 after recovery
    assert pipe.ndump_fast == 3
    # and the recovery start matches the reference arithmetic
    missed_accs = (10_000 * g) // CFG.acc_len
    assert pipe.fast_ctrl.start_time == (missed_accs + 10) * CFG.acc_len


def test_slow_accumulator_recovers_after_break():
    """The SLOW accumulator must also resume after a resync.  Its
    realign measures missed integrations from the fast controller's
    RECOVERED start (the new output-stream head, the reference's
    upstream_start_time at corr_acc_block.py:215-235) — measured from
    the raw capture head, its margin-2 restart lands before the fast
    margin-10 restart and the exact-match boundary never arrives
    (witnessed: slow dumps stopped forever after a break)."""
    src = source.DummySource(CFG, mode="random")
    pipe = XEnginePipeline(CFG, src, autostartat=0)

    g = CFG.ntime_gulp
    acc, accs = CFG.acc_len, CFG.acc_len_slow
    nacc_gulps = acc // g

    # mirror the controllers' arithmetic to size segment B
    gap_start = 10_000 * g
    fast_last = accs - acc                      # start of last seq-1 window
    fast_rec = fast_last + ((gap_start - fast_last) // acc + 10) * acc
    slow_rec = ((fast_rec - 0) // accs + 2) * accs
    ngulp2 = (slow_rec + accs - gap_start) // g + 2 * nacc_gulps

    def ingest():
        # sequence 1: one full SLOW window (two fast windows)
        seq = pipe.staging.begin_sequence(1, src.header(seq0=0))
        for i in range(accs // g):
            pipe.staging.write_span(seq, src.gulp(i))
        pipe.staging.end_sequence(seq)
        seq2 = pipe.staging.begin_sequence(2, src.header(seq0=gap_start))
        for i in range(ngulp2):
            pipe.staging.write_span(seq2, src.gulp(i))
        pipe.staging.end_sequence(seq2)
        pipe.staging.shutdown()

    threads = [threading.Thread(target=ingest, daemon=True),
               threading.Thread(target=pipe._compute, daemon=True),
               threading.Thread(target=pipe._output, daemon=True)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
        assert not t.is_alive()

    # one slow dump before the break, at least one after recovery
    assert pipe.ndump_slow >= 2, (pipe.ndump_slow, pipe.ndump_fast)
    assert pipe.slow_ctrl.start_time == slow_rec
    assert pipe.fast_ctrl.start_time == fast_rec


def test_ingest_splits_sequences_on_discontinuity():
    """The ingest thread itself must detect timestamp jumps from the
    source and start a new staging sequence (capture-engine parity)."""
    g = CFG.ntime_gulp
    nacc_gulps = CFG.acc_len // g
    gap_start = 1000 * g
    missed_accs = gap_start // CFG.acc_len
    recover = (missed_accs + 10) * CFG.acc_len
    n_after = (recover - gap_start) // g + nacc_gulps

    class JumpSource(source.DummySource):
        def stream(self, ngulp, seq0=0):
            for i in range(nacc_gulps):
                yield i * g, self.gulp(i)
            for i in range(n_after):
                yield gap_start + i * g, self.gulp(i)

    src = JumpSource(CFG, mode="random")
    pipe = XEnginePipeline(CFG, src, autostartat=0)
    pipe.run(0, timeout_s=300)
    assert pipe.ndump_fast == 2  # one before the jump, one after re-arm
    assert pipe.fast_ctrl.start_time == recover
