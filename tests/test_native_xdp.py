"""AF_XDP kernel-bypass capture (the reference's UDPVerbsCapture
analog, capture_block.py:180-189): functional gates on loopback.

Skips cleanly where AF_XDP is unavailable (old kernel, missing
CAP_NET_ADMIN/CAP_BPF, no interface queue) — the recvmmsg engine is
the default and fully gated elsewhere (test_native.py)."""

import os

import numpy as np
import pytest

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.io import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

CFG = cfgmod.XEngineConfig(nstand=16, nchan=32, ntime_gulp=12,
                           acc_len=240, acc_len_slow=480, nbeam=4,
                           ntime_sum=12, npipeline=2)


def _xdp_cap(port, nbuf=4, cfg=CFG):
    import time

    # a just-closed engine's bpf_link detaches asynchronously (RCU
    # grace period); a back-to-back attach can transiently fail
    last = None
    for _ in range(10):
        try:
            return native.NativeCapture(cfg, port=port, nbuf=nbuf,
                                        xdp_ifname="lo")
        except OSError as e:
            last = e
            time.sleep(0.2)
    pytest.skip(f"AF_XDP unavailable on this host: {last}")


def test_xdp_capture_gulps_byte_exact():
    cap = _xdp_cap(23461)
    cap.start()
    rng = np.random.RandomState(7)
    data = rng.randint(0, 256, [CFG.ntime_gulp, CFG.nchan, CFG.ninput]
                       ).astype(np.uint8)
    for g in range(3):
        native.transmit_gulp("127.0.0.1", 23461, data,
                             seq0=g * CFG.ntime_gulp,
                             nchan_per_pkt=8, npol_per_pkt=CFG.ninput)
    for g in range(3):
        seq0, gulp = cap.get_gulp(timeout_s=3.0)
        assert seq0 == g * CFG.ntime_gulp
        np.testing.assert_array_equal(gulp, data)
    stats = cap.stats()
    assert stats["nmissing"] == 0
    assert stats["npkt"] == 3 * CFG.ntime_gulp * (CFG.nchan // 8)
    cap.close()


def test_xdp_port_filter_passes_other_traffic():
    """The in-kernel BPF filter must redirect ONLY its own port:
    a plain UDP socket on a different port keeps receiving while the
    XDP engine is attached to the same interface."""
    import socket

    cap = _xdp_cap(23462)
    cap.start()
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 23463))
    rx.settimeout(2.0)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.sendto(b"hello-past-xdp", ("127.0.0.1", 23463))
    assert rx.recv(64) == b"hello-past-xdp"
    rx.close()
    tx.close()
    cap.close()


def test_xdp_loss_accounting():
    """Dropped packets leave zeroed holes and are counted, exactly as
    the recvmmsg engine's contract."""
    cap = _xdp_cap(23464)
    cap.start()
    rng = np.random.RandomState(9)
    data = rng.randint(1, 255, [CFG.ntime_gulp, CFG.nchan, CFG.ninput]
                       ).astype(np.uint8)
    # miss_every=7 drops deliberate packets at the blaster
    # (test_tx_mt.c DELIBERATELY_MISS_PACKETS parity); lossy gulps are
    # only emitted once the stream advances past them by the lead
    # distance, so trailing clean gulps push them out
    for g in range(6):
        native.transmit_gulp("127.0.0.1", 23464, data,
                             seq0=g * CFG.ntime_gulp, nchan_per_pkt=8,
                             npol_per_pkt=CFG.ninput,
                             miss_every=7 if g < 3 else 0)
    got = 0
    holes = False
    for g in range(3):   # last gulp may be held for lead distance
        seq0, gulp = cap.get_gulp(timeout_s=3.0)
        if seq0 is None:
            break
        got += 1
        zero_rows = (gulp.reshape(CFG.ntime_gulp, -1) == 0).all(axis=1)
        holes = holes or zero_rows.any() or not (gulp == data).all()
    assert got >= 2
    assert holes        # the dropped packets really left zeroed holes
    cap.close()


def test_xdp_multibuffer_carries_production_jumbo_frames():
    """The REAL SNAP2 wire geometry under kernel bypass (VERDICT r4
    missing #3): 96 chans x 64 pols = 6144 B payloads + header — past
    the 4 KB UMEM chunk, so each packet arrives as two XDP fragments
    (XDP_USE_SG) and must be reassembled byte-exactly.  Matches the
    reference's production packet size (lwa352-pipeline.py:177:
    6272 B with its 128 B header)."""
    cfg = cfgmod.XEngineConfig(nstand=32, nchan=96, ntime_gulp=12,
                               acc_len=240, acc_len_slow=480, nbeam=4,
                               ntime_sum=12, npipeline=2)
    cap = _xdp_cap(23466, cfg=cfg)
    cap.start()
    if not cap.xdp_multibuffer:
        cap.close()
        pytest.skip("kernel without AF_XDP multi-buffer (XDP_USE_SG): "
                    "jumbo snap2 frames need the recvmmsg engine here")
    rng = np.random.RandomState(11)
    data = rng.randint(0, 256, [cfg.ntime_gulp, cfg.nchan, cfg.ninput]
                       ).astype(np.uint8)
    for g in range(3):
        # ONE packet per time sample: the full 96x64 = 6144 B payload
        native.transmit_gulp("127.0.0.1", 23466, data,
                             seq0=g * cfg.ntime_gulp,
                             nchan_per_pkt=cfg.nchan,
                             npol_per_pkt=cfg.ninput)
    for g in range(3):
        seq0, gulp = cap.get_gulp(timeout_s=3.0)
        assert seq0 == g * cfg.ntime_gulp
        np.testing.assert_array_equal(gulp, data)
    stats = cap.stats()
    assert stats["nmissing"] == 0
    assert stats["npkt"] == 3 * cfg.ntime_gulp
    cap.close()


def test_xdp_max_size_datagram_does_not_poison_stream():
    """A maximum-size UDP datagram (65507 B payload = 65549 B with
    eth/ip/udp headers) through the multi-buffer path: the reassembly
    cap must admit it (payload cap + the 42 header bytes riding in
    frag 0 — previously engine-dependently dropped), the malformed
    snap2 content must be rejected gracefully, and subsequent valid
    gulps must still arrive byte-exact."""
    import socket

    cap = _xdp_cap(23467)
    cap.start()
    if not cap.xdp_multibuffer:
        cap.close()
        pytest.skip("kernel without AF_XDP multi-buffer (XDP_USE_SG)")
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF, 1 << 20)
    s.sendto(b"\xff" * 65507, ("127.0.0.1", 23467))  # ~17 XDP frags
    s.close()
    rng = np.random.RandomState(13)
    data = rng.randint(0, 256, [CFG.ntime_gulp, CFG.nchan, CFG.ninput]
                       ).astype(np.uint8)
    for g in range(2):
        native.transmit_gulp("127.0.0.1", 23467, data,
                             seq0=g * CFG.ntime_gulp,
                             nchan_per_pkt=8, npol_per_pkt=CFG.ninput)
    for g in range(2):
        seq0, gulp = cap.get_gulp(timeout_s=3.0)
        assert seq0 == g * CFG.ntime_gulp
        np.testing.assert_array_equal(gulp, data)
    assert cap.stats()["nmissing"] == 0
    cap.close()


@pytest.mark.skipif(os.environ.get("CBD_FULL_RATE") != "1",
                    reason="full-rate gate: set CBD_FULL_RATE=1 on a "
                           "quiet host")
def test_xdp_rate_smoke():
    """Generic-mode AF_XDP on loopback at a production-like geometry
    (packets under the 4 KB UMEM chunk cap): must sustain multi-Gb/s
    loss-free.  On loopback generic XDP copies like the kernel stack,
    so this validates the mechanism at rate rather than claiming the
    bypass speedup (that needs a physical NIC in driver mode)."""
    import threading
    import time

    cfg = cfgmod.XEngineConfig(nstand=352, nchan=192, ntime_gulp=480)
    cap = _xdp_cap(23465, nbuf=8, cfg=cfg)
    cap.start()
    rng = np.random.RandomState(1)
    data = rng.randint(0, 256, [cfg.ntime_gulp, cfg.nchan, cfg.ninput]
                       ).astype(np.uint8)
    ngulp = 20
    tx = threading.Thread(target=native.transmit_stream, args=(
        "127.0.0.1", 23465, data, ngulp), kwargs=dict(
        nchan_per_pkt=4, npol_per_pkt=cfg.ninput, delay_ns=2_000_000))
    t0 = time.perf_counter()
    tx.start()
    got = 0
    while got < ngulp:
        seq0, _ = cap.get_gulp(timeout_s=3.0)
        if seq0 is None:
            break
        got += 1
    tx.join()
    dt = time.perf_counter() - t0
    stats = cap.stats()
    cap.close()
    gbps = 8 * got * data.nbytes / dt / 1e9
    assert stats["nmissing"] == 0, stats
    assert got == ngulp
    assert gbps >= 5.0, f"AF_XDP sustained only {gbps:.2f} Gb/s"
