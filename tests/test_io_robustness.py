"""Regressions from the round-4 sources/HDF5/offline review."""

import socket
import threading

import numpy as np
import pytest

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.io import packets as pk
from caltech_bifrost_dsp_tpu.io import source

CFG = cfgmod.TINY


def test_offline_taper_attenuates_amplitude_not_phase():
    """cfg.weighting is an AMPLITUDE taper: a taper of 0 must exclude
    the antenna; previously it multiplied the delay inside the
    exponential (|w|==1 always), contributing the antenna at full
    amplitude with a corrupted phase."""
    from caltech_bifrost_dsp_tpu.models import offline

    enz = np.array([[0.0, 0.0, 0.0], [100.0, 0.0, 0.0],
                    [0.0, 100.0, 0.0]])
    cfg = offline.OfflineBeamConfig(
        ra_deg=[10.0], dec_deg=[40.0], nbeam=1, enz_positions=enz,
        weighting=np.array([1.0, 0.0, 0.5]))
    freqs = 50e6 + np.arange(8) * 1e5
    w = offline.compute_offline_weights(cfg, freqs, t_unix=1.7e9)
    amp = np.abs(w[0])  # [nchan, nstand*npol]
    np.testing.assert_allclose(amp[:, 0:2], 1.0, rtol=1e-6)
    np.testing.assert_allclose(amp[:, 2:4], 0.0, atol=1e-9)
    np.testing.assert_allclose(amp[:, 4:6], 0.5, rtol=1e-6)
    # the nonzero antennas keep a pure geometric phase
    assert np.abs(np.abs(w[0][:, 4:6]) - 0.5).max() < 1e-6


def test_hdf5_full_writer_clips_out_of_range_blocks(tmp_path):
    """Negative time/freq offsets previously WRAPPED via python slicing
    and silently overwrote the END of the observation dataset."""
    import h5py

    from caltech_bifrost_dsp_tpu.io.hdf5 import FullObservationHDF5Writer

    prefix = str(tmp_path / "obs")
    wr = FullObservationHDF5Writer(
        prefix, ra=10.0, dec=40.0, tstart_unix=1000.0, tstep_s=1.0,
        total_nsamples=16, sfreq_hz=50e6, fstep_hz=1e5, total_nfreq=8)
    path = wr.filename
    block = np.full((4, 8), 7.0, np.float32)
    # entirely before the observation: must be dropped, not wrapped
    wr.write(block, t_unix=1000.0 - 100.0, sfreq_hz=50e6)
    # partially before: the overlapping rows land, clipped
    wr.write(block, t_unix=998.0, sfreq_hz=50e6)
    # overhanging the end: clipped instead of crashing
    wr.write(block, t_unix=1014.0, sfreq_hz=50e6)
    wr.close()
    with h5py.File(path, "r") as fh:
        data = fh["Observation1/Tuning1/I"][...]
    assert np.all(data[0:2] == 7.0)      # clipped head landed
    assert np.all(data[2:14] == 0.0)     # middle untouched
    assert np.all(data[14:16] == 7.0)    # clipped tail landed


def _snap_pkt(seq, chan_block, pol0, nchan, npol, fill):
    hdr = pk.Snap2Header(seq=seq, npol=npol, npol_tot=CFG.ninput,
                         nchan=nchan, nchan_tot=CFG.nchan,
                         chan_block_id=chan_block,
                         chan0=chan_block * nchan, pol0=pol0)
    return pk.encode_snap2(hdr, np.full((nchan, npol), fill, np.uint8))


def test_udp_source_duplicates_do_not_fake_completion():
    """A duplicated datagram must not advance completion: previously a
    dup + a genuine loss ended the gulp 'complete' with the lost region
    silently zero and nmissing == 0."""
    port = 19791
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", port))
    src = source.UdpSnap2Source(CFG, rx, timeout_s=1.0)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    dst = ("127.0.0.1", port)
    g = CFG.ntime_gulp
    nchan_pkt, npol_pkt = CFG.nchan, CFG.ninput  # 1 packet per time

    def blast():
        for t in range(g - 1):  # drop the last time sample...
            tx.sendto(_snap_pkt(t, 0, 0, nchan_pkt, npol_pkt, 0x11), dst)
        # ...and duplicate t=0 so the naive count reaches 'expected'
        tx.sendto(_snap_pkt(0, 0, 0, nchan_pkt, npol_pkt, 0x11), dst)

    th = threading.Thread(target=blast, daemon=True)
    th.start()
    buf = src.capture_gulp(0)
    th.join()
    rx.close()
    assert src.nmissing == 1          # the genuinely lost packet
    assert np.all(buf[g - 1] == 0)    # its region stays zero
    assert np.all(buf[: g - 1] == 0x11)


def test_udp_source_boundary_duplicate_does_not_fake_completion():
    """A packet stashed for the NEXT gulp and its duplicate arriving
    once that gulp is current must dedup against the SAME key.
    Previously the stash key was relative to the stashing seq_start
    (t in [g,2g)) while the post-pop duplicate got a [0,g) key, so the
    dup double-counted, assembly exited early, and a genuine loss in
    the same gulp went unrecorded with its region silently zero."""
    port = 19795
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", port))
    src = source.UdpSnap2Source(CFG, rx, timeout_s=1.0)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    dst = ("127.0.0.1", port)
    g = CFG.ntime_gulp
    # early packet for gulp 1 first, so gulp-0 assembly stashes it
    tx.sendto(_snap_pkt(g, 0, 0, CFG.nchan, CFG.ninput, 0x22), dst)
    for t in range(g):
        tx.sendto(_snap_pkt(t, 0, 0, CFG.nchan, CFG.ninput, 0x11), dst)
    buf0 = src.capture_gulp(0)
    assert np.all(buf0 == 0x11)
    # gulp 1: a DUPLICATE of the stashed packet, the middle times, and
    # the final time sample genuinely lost
    tx.sendto(_snap_pkt(g, 0, 0, CFG.nchan, CFG.ninput, 0x22), dst)
    for t in range(g + 1, 2 * g - 1):
        tx.sendto(_snap_pkt(t, 0, 0, CFG.nchan, CFG.ninput, 0x22), dst)
    buf1 = src.capture_gulp(g)
    rx.close()
    tx.close()
    assert src.nmissing == 1           # the loss is recorded...
    assert np.all(buf1[g - 1] == 0)    # ...and its region stays zero
    assert np.all(buf1[: g - 1] == 0x22)


def test_udp_source_prunes_skipped_stashes():
    """Stashed future-gulp buffers for bases the caller skips past must
    be pruned (previously they leaked forever across resyncs)."""
    port = 19793
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", port))
    src = source.UdpSnap2Source(CFG, rx, timeout_s=0.5)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    dst = ("127.0.0.1", port)
    g = CFG.ntime_gulp
    # early packets for gulps 1 and 2 stash buffers while gulp 0 times out
    tx.sendto(_snap_pkt(g, 0, 0, CFG.nchan, CFG.ninput, 1), dst)
    tx.sendto(_snap_pkt(2 * g, 0, 0, CFG.nchan, CFG.ninput, 2), dst)
    src.capture_gulp(0)
    assert len(src._pending) == 2
    # the caller resyncs far ahead: stale stashes must be dropped
    src.capture_gulp(100 * g)
    rx.close()
    assert len(src._pending) == 0
    assert len(src._filled) == 0


def test_adc_header_marks_samples_real():
    cfg = cfgmod.XEngineConfig(
        nstand=8, nchan=16, ntime_gulp=48, acc_len=96, acc_len_slow=96,
        nbeam=2, ntime_sum=12, nchan_sum=4, pfb_ntap=4,
        adc_dtype="int8", pfb_fft_impl="matmul")
    h = source.ADCSource(cfg, mode="noise").header(seq0=0)
    assert h["complex"] is False
    assert h["nbit"] == 8


def test_pallas_pfb_engine_requires_matmul_impl():
    with pytest.raises(ValueError):
        cfgmod.XEngineConfig(
            nstand=8, nchan=16, ntime_gulp=48, acc_len=96,
            acc_len_slow=96, nbeam=2, ntime_sum=12, nchan_sum=4,
            pfb_engine="pallas", pfb_fft_impl="fft")
