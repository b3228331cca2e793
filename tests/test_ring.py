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


# -- backed (contiguous) mode -----------------------------------------------


def test_backed_reserve_commit_release_roundtrip():
    """Zero-copy writer protocol: reservations land in the backing
    buffer, commit publishes, release frees space for reuse."""
    r = Ring("bk", nbyte_budget=256, backing=True)
    seq = r.begin_sequence(1, {})
    a = r.reserve_span(64, timeout=1.0)
    assert a is not None and a.nbytes == 64
    a[:] = 7
    r.commit_span(seq, a)
    b = r.reserve_span(64, timeout=1.0)
    b[:] = 9
    r.commit_span(seq, b)
    r.end_sequence(seq)
    r.shutdown()
    seqs = list(r.read(timeout=1.0))
    got = list(r.read_spans(seqs[0], timeout=1.0))
    assert [g[0] for g in got] == [7, 9]
    # adjacent reservations -> one contiguous zero-copy view
    flat = r.contiguous_view(got)
    assert flat is not None and flat.nbytes == 128
    assert flat.base is not None  # a view, not a copy
    np.testing.assert_array_equal(flat[:64], 7)
    np.testing.assert_array_equal(flat[64:], 9)
    for g in got:
        r.release_span(g)


def test_backed_backpressure_until_release():
    """The writer blocks when the reader still owns the ring, and wakes
    on release_span — guaranteed-read semantics at the allocator."""
    r = Ring("bk2", nbyte_budget=256, backing=True)
    seq = r.begin_sequence(1, {})
    held = []
    for _ in range(4):
        v = r.reserve_span(64, timeout=1.0)
        assert v is not None
        r.commit_span(seq, v)
        held.append(v)
    t0 = time.monotonic()
    assert r.reserve_span(64, timeout=0.2) is None
    assert time.monotonic() - t0 >= 0.2

    def release_later():
        time.sleep(0.1)
        r.release_span(held[0])

    threading.Thread(target=release_later, daemon=True).start()
    v = r.reserve_span(64, timeout=2.0)
    assert v is not None  # woke when the head span freed


def test_backed_out_of_order_release_and_wrap():
    """Out-of-order frees are held until the FIFO head clears (skipped
    gulps), and wrap-edge padding keeps reservations contiguous."""
    r = Ring("bk3", nbyte_budget=160, backing=True)
    a = r.reserve_span(64, timeout=1.0)
    b = r.reserve_span(64, timeout=1.0)
    r.release_span(b)                      # out of order: no space yet
    assert r.reserve_span(64, timeout=0.1) is None
    r.release_span(a)                      # head frees -> both reclaimed
    c = r.reserve_span(64, timeout=1.0)    # wraps: pad 32B, restart at 0
    assert c is not None
    a2 = r.reserve_span(64, timeout=1.0)
    assert a2 is not None
    # c (off 0) and a2 (off 64) are adjacent; view spans both
    assert r.contiguous_view([c, a2]) is not None
    # but a wrap between spans breaks contiguity -> None (caller copies)
    r.release_span(c)
    r.release_span(a2)
    d = r.reserve_span(64, timeout=1.0)    # off 128? no: pad to wrap
    e = r.reserve_span(64, timeout=1.0)
    if r._span_off(d) + 64 != r._span_off(e):
        assert r.contiguous_view([d, e]) is None


def test_backed_heap_spans_coexist():
    """write_span (heap) spans still work on a backed ring and
    release_span is a no-op for them."""
    r = Ring("bk4", nbyte_budget=1 << 12, backing=True)
    seq = r.begin_sequence(1, {})
    heap = np.arange(32, dtype=np.uint8)
    assert r.write_span(seq, heap)
    v = r.reserve_span(32, timeout=1.0)
    v[:] = 1
    r.commit_span(seq, v)
    r.end_sequence(seq)
    r.shutdown()
    got = list(r.read_spans(list(r.read(timeout=1.0))[0], timeout=1.0))
    assert len(got) == 2
    np.testing.assert_array_equal(got[0], heap)
    r.release_span(got[0])  # heap: no-op
    r.release_span(got[1])
    assert r.contiguous_view(got) is None  # mixed -> not contiguous


def test_write_span_larger_than_budget_fails_fast():
    """A blocking write of a span that can never fit must raise, not
    deadlock on a backpressure predicate that can never become true."""
    import pytest

    r = Ring("t", nbyte_budget=1024)
    seq = r.begin_sequence(time_tag=0, header={})
    with pytest.raises(ValueError):
        r.write_span(seq, np.zeros(4096, np.uint8))


def test_long_run_holds_only_in_flight_state():
    """24/7 leak regression: consumed spans are REMOVED (not
    tombstoned) and consumed+closed sequences are pruned, so an
    eternal stream holds only in-flight state."""
    import threading

    r = Ring("leak", nbyte_budget=1 << 20)
    consumed = []

    def reader():
        for seq in r.read(timeout=5.0):
            for span in r.read_spans(seq, timeout=5.0):
                consumed.append(span[0])

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    # many short sequences (resyncs), each fully consumed
    for s in range(50):
        seq = r.begin_sequence(s, {"seq0": s})
        for i in range(20):
            r.write_span(seq, np.full(128, i, np.uint8))
        r.end_sequence(seq)
    # one long open sequence
    seq = r.begin_sequence(99, {"seq0": 99})
    for i in range(500):
        r.write_span(seq, np.full(128, i % 251, np.uint8))
    # let the reader drain
    deadline = __import__("time").time() + 10
    while len(consumed) < 50 * 20 + 500 and \
            __import__("time").time() < deadline:
        __import__("time").sleep(0.02)
    assert len(consumed) == 50 * 20 + 500
    # the open sequence's deque holds nothing once consumed
    assert len(seq.spans) == 0
    # closed+consumed sequences were pruned from the ring
    assert len(r._sequences) <= 2
    assert r._nbyte == 0
    r.shutdown()
    th.join(timeout=10)
