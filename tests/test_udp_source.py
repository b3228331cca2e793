"""Pure-Python snap2 UDP capture (fallback ingest path)."""

import socket

import numpy as np

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.io import packets as pk
from caltech_bifrost_dsp_tpu.io.source import UdpSnap2Source

CFG = cfgmod.XEngineConfig(nstand=8, nchan=16, ntime_gulp=12, acc_len=24,
                           acc_len_slow=48, nbeam=4, ntime_sum=12,
                           npipeline=2)


def test_python_capture_loopback(rng):
    port = 19840
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4 << 20)
    rx.bind(("127.0.0.1", port))
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    src = UdpSnap2Source(CFG, rx, timeout_s=3.0)
    gulp = rng.randint(0, 256,
                       [CFG.ntime_gulp, CFG.nchan, CFG.ninput]
                       ).astype(np.uint8)
    for raw in pk.snap2_packets_for_gulp(gulp, seq0=0, chan0=0,
                                         nchan_tot=CFG.nchan,
                                         npol_tot=CFG.ninput,
                                         npol_per_pkt=8,
                                         nchan_per_pkt=8):
        tx.sendto(raw, ("127.0.0.1", port))
    got = src.capture_gulp(seq_start=0)
    np.testing.assert_array_equal(got, gulp)
    assert src.nmissing == 0
    assert src.ngood_bytes == gulp.nbytes
    rx.close()
    tx.close()


def test_python_capture_counts_missing(rng):
    port = 19841
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", port))
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    src = UdpSnap2Source(CFG, rx, timeout_s=0.5)
    gulp = rng.randint(0, 256,
                       [CFG.ntime_gulp, CFG.nchan, CFG.ninput]
                       ).astype(np.uint8)
    pkts = list(pk.snap2_packets_for_gulp(gulp, seq0=0, chan0=0,
                                          nchan_tot=CFG.nchan,
                                          npol_tot=CFG.ninput,
                                          npol_per_pkt=8,
                                          nchan_per_pkt=8))
    for raw in pkts[:-3]:  # drop the last three packets
        tx.sendto(raw, ("127.0.0.1", port))
    got = src.capture_gulp(seq_start=0)
    assert src.nmissing == 3
    # holes are zero-filled; received regions intact
    mask = got != 0
    np.testing.assert_array_equal(got[mask], gulp[mask])
    rx.close()
    tx.close()


def test_boundary_interleaved_packets_are_stashed(rng):
    """Next-gulp packets drained while completing the current gulp must
    be stashed and pre-loaded, not dropped as fake loss (regression:
    they were discarded and re-counted as missing every boundary)."""
    port = 19843
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 4 << 20)
    rx.bind(("127.0.0.1", port))
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    src = UdpSnap2Source(CFG, rx, timeout_s=3.0)
    g = CFG.ntime_gulp
    gulps = [rng.randint(0, 256, [g, CFG.nchan, CFG.ninput])
             .astype(np.uint8) for _ in range(2)]
    pkts0 = list(pk.snap2_packets_for_gulp(
        gulps[0], seq0=0, chan0=0, nchan_tot=CFG.nchan,
        npol_tot=CFG.ninput, npol_per_pkt=8, nchan_per_pkt=8))
    pkts1 = list(pk.snap2_packets_for_gulp(
        gulps[1], seq0=g, chan0=0, nchan_tot=CFG.nchan,
        npol_tot=CFG.ninput, npol_per_pkt=8, nchan_per_pkt=8))
    # interleave: half of gulp 1 lands before gulp 0 completes
    order = pkts0[: len(pkts0) // 2] + pkts1[: len(pkts1) // 2] \
        + pkts0[len(pkts0) // 2:] + pkts1[len(pkts1) // 2:]
    for raw in order:
        tx.sendto(raw, ("127.0.0.1", port))
    got0 = src.capture_gulp(seq_start=0)
    got1 = src.capture_gulp(seq_start=g)
    np.testing.assert_array_equal(got0, gulps[0])
    np.testing.assert_array_equal(got1, gulps[1])
    assert src.nmissing == 0
    rx.close()
    tx.close()
