"""Host ring-buffer semantics: sequences, backpressure, shutdown,
multi-sequence ordering, history-ring residency."""

import threading
import time

import numpy as np
import pytest

from caltech_bifrost_dsp_tpu.runtime.ring import HistoryRing, Ring


def test_sequence_roundtrip():
    r = Ring("t", nbyte_budget=1 << 16)
    seq = r.begin_sequence(1, {"seq0": 0})
    spans = [np.arange(16, dtype=np.uint8) + i for i in range(4)]
    for s in spans:
        assert r.write_span(seq, s)
    r.end_sequence(seq)
    r.shutdown()
    got_seqs = list(r.read(timeout=1.0))
    assert len(got_seqs) == 1
    got = list(r.read_spans(got_seqs[0], timeout=1.0))
    assert len(got) == 4
    for a, b in zip(got, spans):
        np.testing.assert_array_equal(a, b)


def test_backpressure_blocks_writer():
    r = Ring("bp", nbyte_budget=256)
    seq = r.begin_sequence(1, {})
    big = np.zeros(200, np.uint8)
    assert r.write_span(seq, big)
    # second write exceeds budget -> nonblocking fails, blocking times out
    assert not r.write_span(seq, big, blocking=False)
    t0 = time.monotonic()
    assert not r.write_span(seq, big, timeout=0.2)
    assert time.monotonic() - t0 >= 0.2
    # a reader draining the first span releases the writer
    release = threading.Event()

    def drain():
        for s in r.read(timeout=1.0):
            for _ in r.read_spans(s, timeout=1.0):
                release.set()
                return

    th = threading.Thread(target=drain, daemon=True)
    th.start()
    assert r.write_span(seq, big, timeout=2.0)
    th.join(timeout=2.0)
    assert release.is_set()


def test_budget_rounds_to_power_of_two():
    r = Ring("p2", nbyte_budget=1000)
    assert r.nbyte_budget == 1024


def test_multiple_sequences_in_order():
    r = Ring("ms", nbyte_budget=1 << 16)
    for i in range(3):
        seq = r.begin_sequence(i, {"seq0": i * 100})
        r.write_span(seq, np.full(8, i, np.uint8))
        r.end_sequence(seq)
    r.shutdown()
    seqs = list(r.read(timeout=1.0))
    assert [s.header["seq0"] for s in seqs] == [0, 100, 200]


def test_history_ring_wraparound_and_residency():
    h = HistoryRing(nbyte=8 * 4, frame_nbyte=4)
    for i in range(12):
        h.push(np.full(4, i, np.uint8))
    assert h.count == 12
    assert h.earliest() == 4
    snap = h.snapshot(4, 8)
    np.testing.assert_array_equal(snap[:, 0], np.arange(4, 12))
    with pytest.raises(IndexError):
        h.snapshot(0, 4)  # evicted
    with pytest.raises(IndexError):
        h.snapshot(10, 8)  # beyond head
