"""Sources and sinks: DummySource parity, corr/beam packet emitters with
receiver-side reassembly, triggered dump + replay."""

import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.io import packets as pk
from caltech_bifrost_dsp_tpu.io import sink, source
from caltech_bifrost_dsp_tpu.ops import correlate
from caltech_bifrost_dsp_tpu.runtime.ring import HistoryRing
from caltech_bifrost_dsp_tpu.verification import golden

CFG = cfgmod.TINY


def test_dummy_source_ramp_deterministic():
    src = source.DummySource(CFG, mode="ramp")
    g0 = src.gulp(0)
    g1 = src.gulp(1)
    assert g0.shape == (CFG.ntime_gulp, CFG.nchan, CFG.ninput)
    n = g0.size
    assert g0.ravel()[0] == 0
    assert g1.ravel()[0] == n & 0xFF


def test_dummy_source_testfile_loops(tmp_path):
    ntime = CFG.acc_len
    path = str(tmp_path / "in.dat")
    golden.write_input_file(path, ntime, CFG.nchan, CFG.nstand, CFG.npol,
                            CFG.acc_len)
    src = source.DummySource(CFG, mode="testfile", testfile=path)
    # gulps must tile the file contents and wrap
    _, data = golden.read_dat(path)
    flat = data.reshape(ntime, CFG.nchan, CFG.ninput)
    nper = ntime // CFG.ntime_gulp
    g = src.get_testfile_gulp(nper)  # wraps to start
    np.testing.assert_array_equal(g, flat[:CFG.ntime_gulp])


def test_dummy_source_header_fields():
    hdr = source.DummySource(CFG).header(seq0=960, sync_time=17)
    for k in ("time_tag", "sync_time", "seq0", "chan0", "nchan",
              "system_nchan", "fs_hz", "sfreq", "bw_hz", "nstand", "npol",
              "complex", "nbit"):
        assert k in hdr
    assert hdr["nbit"] == 4 and hdr["system_nchan"] == CFG.system_nchan


def test_corr_full_output_receiver_roundtrip():
    """Packetize a dump and rebuild the full Hermitian matrix the way the
    reference receiver does (corr_full_rx.py:94-99)."""
    block = next(golden.generate_input_blocks(
        CFG.ntime_gulp, CFG.nchan, CFG.nstand, CFG.npol, CFG.ntime_gulp))
    vis = correlate.correlate_gulp(jnp.asarray(
        block.reshape(CFG.ntime_gulp, CFG.nchan, CFG.ninput)))
    dense = correlate.vis_to_numpy_complex(vis)

    pkts = []
    out = sink.CorrFullOutput(CFG, send=pkts.append)
    n = out.send_matrix(dense, sync_time=7, spectra_id=0,
                        acc_len=CFG.ntime_gulp)
    assert n == CFG.nstand * (CFG.nstand + 1) // 2 == len(pkts)
    outbuf = np.zeros((CFG.nstand, CFG.nstand, CFG.npol, CFG.npol,
                       CFG.nchan), np.complex128)
    for raw in pkts:
        h, payload = pk.decode_corr_full(raw)
        for p0 in range(h.npols):
            for p1 in range(h.npols):
                outbuf[h.stand0, h.stand1, p0, p1] = (
                    payload[p0, p1, :, 0] + 1j * payload[p0, p1, :, 1])
                outbuf[h.stand1, h.stand0, p0, p1] = (
                    payload[p1, p0, :, 0] - 1j * payload[p1, p0, :, 1])
    ref = golden.reference_correlation(block)
    np.testing.assert_array_equal(outbuf.transpose(4, 0, 1, 2, 3), ref)


def test_corr_full_output_checkfile(tmp_path):
    path = str(tmp_path / "corr.dat")
    ntime = 2 * CFG.acc_len
    golden.write_corr_file(path, ntime, CFG.nchan, CFG.nstand, CFG.npol,
                           CFG.acc_len)
    blocks = list(golden.generate_input_blocks(
        ntime, CFG.nchan, CFG.nstand, CFG.npol, CFG.acc_len))
    vis = correlate.correlate_gulp(jnp.asarray(
        blocks[0].reshape(CFG.acc_len, CFG.nchan, CFG.ninput)))
    dense = correlate.vis_to_numpy_complex(vis)
    out = sink.CorrFullOutput(CFG, checkfile=path,
                              checkfile_acc_len=CFG.acc_len)
    assert out.check_against_file(dense, CFG.acc_len, 0)
    assert not out.check_against_file(dense + 1, CFG.acc_len, 0)
    assert out.check_count == 2 and out.check_failures == 1


def test_corr_part_output(rng):
    nchan_out = CFG.nchan // CFG.nchan_sum
    sub_r = rng.randint(-500, 500, [nchan_out, CFG.nvis_out]) \
        .astype(np.int32)
    sub_i = rng.randint(-500, 500, [nchan_out, CFG.nvis_out]) \
        .astype(np.int32)
    bl = np.asarray([[[i % CFG.nstand, 0]] * 2
                     for i in range(CFG.nvis_out)], np.uint32)
    pkts = []
    out = sink.CorrPartOutput(CFG, send=pkts.append, nvis_per_packet=16)
    out.send_subsel(sub_r, sub_i, bl, sync_time=0, spectra_id=5,
                    acc_len=CFG.acc_len)
    got_r = np.zeros_like(sub_r)
    v = 0
    for raw in pkts:
        h, blp, data = pk.decode_corr_part(raw)
        got_r[:, v:v + h.nvis] = data[..., 0].T
        v += h.nvis
    np.testing.assert_array_equal(got_r, sub_r)


def test_pbeam_and_ibeam_outputs(rng):
    nblock = CFG.ntime_gulp // CFG.ntime_sum
    power = rng.standard_normal(
        [CFG.nbeam // 2, nblock, CFG.nchan, 4]).astype(np.float32)
    streams = {0: [], 1: []}
    out = sink.PBeamOutput(CFG, senders={b: streams[b].append
                                         for b in streams})
    n = out.send_powers(power, seq0=100, navg=CFG.ntime_sum)
    assert n == 2 * nblock
    h, d = pk.decode_pbeam(streams[1][0])
    assert h.beam == 2 and h.navg == CFG.ntime_sum
    np.testing.assert_array_equal(d[:, 0, :], power[1, 0])

    vlbi = rng.standard_normal([CFG.ntime_gulp, CFG.nchan, 2, 2]) \
        .astype(np.float32)
    pkts = []
    ib = sink.IBeamOutput(CFG, send=pkts.append)
    assert ib.send_voltages(vlbi, seq0=100) == CFG.ntime_gulp
    h, d = pk.decode_ibeam(pkts[3])
    assert h.seq == 103
    np.testing.assert_array_equal(d, vlbi[3])


def test_triggered_dump_and_replay(tmp_path):
    frame_nbyte = CFG.nchan * CFG.ninput
    ring = HistoryRing(nbyte=64 * frame_nbyte, frame_nbyte=frame_nbyte)
    hdr = source.sequence_header(CFG, seq0=0)
    hdr.update({"nchan": CFG.nchan, "nstand": CFG.nstand,
                "npol": CFG.npol})
    ring.set_header(hdr, frame0_seq=0)
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, [100, frame_nbyte]).astype(np.uint8)
    for f in frames:
        ring.push(f)
    dumper = sink.TriggeredDump(ring, dump_path=str(tmp_path))
    files = dumper.trigger(ntime_per_file=32, nfile=2)
    assert len(files) == 2
    src = source.TriggerFileSource(files[0])
    h, data = src.read()
    assert h["ntime"] == 32
    # earliest resident frame is 100-64=36
    np.testing.assert_array_equal(
        data.reshape(32, -1), frames[36:68])
    # replay gulps carry advancing seq indices
    seqs = [s for s, _ in src.gulps(8)]
    assert seqs == [h["seq0"] + 8 * i for i in range(4)]


def test_triggered_dump_direct_io(tmp_path, rng):
    """O_DIRECT dump mode (reference: triggered_dump_block.py:260-263)
    produces byte-identical files to the buffered path (falling back
    transparently where the filesystem rejects O_DIRECT)."""
    from caltech_bifrost_dsp_tpu.runtime.ring import HistoryRing

    frame_nbyte = 4 * 16 * 2
    ring = HistoryRing(nbyte=64 * frame_nbyte, frame_nbyte=frame_nbyte)
    ring.set_header({"nchan": 4, "nstand": 16, "npol": 2, "seq0": 0},
                    frame0_seq=0)
    for _ in range(32):
        ring.push(rng.randint(0, 256, frame_nbyte).astype(np.uint8))
    d_buf = sink.TriggeredDump(ring, dump_path=str(tmp_path),
                               file_prefix="buf")
    d_dir = sink.TriggeredDump(ring, dump_path=str(tmp_path),
                               file_prefix="dir", direct=True)
    f1 = d_buf.trigger(ntime_per_file=32 * 128, nfile=1)[0]
    f2 = d_dir.trigger(ntime_per_file=32 * 128, nfile=1)[0]
    assert open(f1, "rb").read() == open(f2, "rb").read()


def test_triggered_dump_adc_seq0_in_spectra_units(tmp_path):
    """ADC-mode dump headers must carry seq0 in output-spectra units
    (the stream's sequence convention, io/native.py AdcCaptureSource),
    not per-frame sample counts — regression: the 2*nchan
    samples-per-spectrum factor leaked into seq0 once the ring held
    more than one frame."""
    nchan, ninput, ntime_gulp = 4, 8, 6
    rows_per_frame = ntime_gulp * 2 * nchan      # int8 sample rows
    frame_nbyte = rows_per_frame * ninput
    ring = HistoryRing(nbyte=4 * frame_nbyte, frame_nbyte=frame_nbyte)
    hdr = {"adc": True, "nbit": 8, "nchan": nchan, "nstand": 4,
           "npol": 2, "ntime_gulp": ntime_gulp}
    ring.set_header(hdr, frame0_seq=0)
    rng = np.random.RandomState(5)
    for _ in range(10):                          # wraps: earliest = 6
        ring.push(rng.randint(0, 256, frame_nbyte).astype(np.uint8))
    dumper = sink.TriggeredDump(ring, dump_path=str(tmp_path))
    files = dumper.trigger(ntime_per_file=rows_per_frame, nfile=1)
    h, data = source.TriggerFileSource(files[0]).read()
    assert h["seq0"] == 6 * ntime_gulp           # spectra, not samples
    assert h["ntime"] == rows_per_frame          # data rows per file


def test_triggered_dump_survives_capture_lapping(tmp_path):
    """If live capture laps the dump cursor mid-dump, the dump must
    skip forward to the earliest resident frame (reference re-opens at
    earliest, triggered_dump_block.py:218) instead of dying on the
    residency check and leaving state stuck at 'dumping'."""
    frame_nbyte = 64
    ring = HistoryRing(nbyte=4 * frame_nbyte, frame_nbyte=frame_nbyte)
    ring.set_header({"nchan": 1, "nstand": 8, "npol": 1}, frame0_seq=0)
    rng = np.random.RandomState(6)
    for _ in range(6):
        ring.push(rng.randint(0, 256, frame_nbyte).astype(np.uint8))
    orig_snapshot = ring.snapshot
    state = {"lapped": False}

    def lapping_snapshot(lo, n):
        if not state["lapped"]:
            state["lapped"] = True
            for _ in range(5):                   # capture laps the cursor
                ring.push(rng.randint(0, 256, frame_nbyte)
                          .astype(np.uint8))
            raise IndexError("requested frames not resident")
        return orig_snapshot(lo, n)

    ring.snapshot = lapping_snapshot
    dumper = sink.TriggeredDump(ring, dump_path=str(tmp_path))
    files = dumper.trigger(ntime_per_file=frame_nbyte // 8, nfile=2)
    assert state["lapped"]
    assert len(files) >= 1                       # completed, not died
