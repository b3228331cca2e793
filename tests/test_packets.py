"""Wire-format round-trip tests (snap2 / COR full / partial / PBEAM /
IBEAM) and packetizer-vs-receiver semantics."""

import numpy as np

from caltech_bifrost_dsp_tpu.io import packets as pk


def test_snap2_roundtrip(rng):
    payload = rng.randint(0, 256, [96, 64]).astype(np.uint8)
    hdr = pk.Snap2Header(seq=12345, npol=64, npol_tot=704, nchan=96,
                         nchan_tot=192, chan_block_id=1, chan0=96, pol0=128)
    raw = pk.encode_snap2(hdr, payload)
    hdr2, payload2 = pk.decode_snap2(raw)
    assert hdr2 == hdr
    np.testing.assert_array_equal(payload2, payload)


def test_snap2_header_layout_matches_reference_struct():
    """Byte-level check against struct snap2_hdr_type
    (test_tx_mt.c:38-49): u64 seq, u32 magic, u16 npol, u16 npol_tot,
    u16 nchan, u16 nchan_tot, u32 chan_block_id, u32 chan0, u32 pol0."""
    hdr = pk.Snap2Header(seq=1, npol=2, npol_tot=3, nchan=4, nchan_tot=5,
                         chan_block_id=6, chan0=7, pol0=8)
    raw = pk.encode_snap2(hdr, np.zeros((4, 2), np.uint8))
    assert len(raw) == 32 + 8
    assert raw[:8] == (1).to_bytes(8, "little")
    assert raw[8:12] == (0xAABBCCDD).to_bytes(4, "little")
    assert raw[12:14] == (2).to_bytes(2, "little")


def test_snap2_packetize_gulp_reassembles(rng):
    ntime, nchan, ninput = 4, 32, 16
    packed = rng.randint(0, 256, [ntime, nchan, ninput]).astype(np.uint8)
    out = np.zeros_like(packed)
    for raw in pk.snap2_packets_for_gulp(packed, seq0=100, chan0=0,
                                         nchan_tot=nchan, npol_tot=ninput,
                                         npol_per_pkt=8, nchan_per_pkt=16):
        hdr, payload = pk.decode_snap2(raw)
        t = hdr.seq - 100
        c0 = hdr.chan_block_id * hdr.nchan
        out[t, c0:c0 + hdr.nchan, hdr.pol0:hdr.pol0 + hdr.npol] = payload
    np.testing.assert_array_equal(out, packed)


def test_corr_full_roundtrip_and_endianness(rng):
    data = rng.randint(-2**31, 2**31 - 1, [2, 2, 8, 2]).astype(np.int32)
    hdr = pk.CorrFullHeader(sync_time=1111, spectra_id=2400, bw_hz=1e6,
                            sfreq_hz=5e7, acc_len=2400, nchans=8, chan0=0,
                            npols=2, stand0=3, stand1=7)
    raw = pk.encode_corr_full(hdr, data)
    # 56-byte header + 2 stand ids per outputs.rst
    assert len(raw) == 56 + 2 * 2 * 8 * 2 * 4
    hdr2, data2 = pk.decode_corr_full(raw)
    assert hdr2 == hdr
    np.testing.assert_array_equal(data2, data)
    # big-endian payload per outputs.rst
    first = int.from_bytes(raw[56:60], "big", signed=True)
    assert first == data[0, 0, 0, 0]


def test_corr_part_roundtrip(rng):
    nvis, nchan = 16, 12
    data = rng.randint(-1000, 1000, [nvis, nchan, 2]).astype(np.int32)
    bl = rng.randint(0, 352, [nvis, 2, 2]).astype(np.uint32)
    hdr = pk.CorrPartHeader(sync_time=9, spectra_id=100, bw_hz=2e6,
                            sfreq_hz=1e7, acc_len=2400, nvis=nvis,
                            nchans=nchan, chan0=48)
    raw = pk.encode_corr_part(hdr, bl, data)
    hdr2, bl2, data2 = pk.decode_corr_part(raw)
    assert hdr2 == hdr
    np.testing.assert_array_equal(bl2, bl)
    np.testing.assert_array_equal(data2, data)


def test_pbeam_roundtrip(rng):
    data = rng.standard_normal([96, 1, 4]).astype(np.float32)
    hdr = pk.PBeamHeader(server=1, beam=2, gbe=0, nchan=96, nbeam=1,
                         nserver=32, navg=24, chan0=96, seq=4800)
    raw = pk.encode_pbeam(hdr, data)
    assert len(raw) == 18 + data.nbytes  # 18-byte header per docstring
    hdr2, data2 = pk.decode_pbeam(raw)
    assert hdr2 == hdr
    np.testing.assert_array_equal(data2, data)


def test_ibeam_roundtrip(rng):
    data = rng.standard_normal([192, 2, 2]).astype(np.float32)
    hdr = pk.IBeamHeader(server=3, gbe=0, nchan=192, nbeam=2, nserver=32,
                         chan0=384, seq=12)
    raw = pk.encode_ibeam(hdr, data)
    hdr2, data2 = pk.decode_ibeam(raw)
    assert hdr2 == hdr
    np.testing.assert_array_equal(data2, data)


# ---------------------------------------------------------------------------
# LWA-SV "COR" (Mark5C) production format
# ---------------------------------------------------------------------------

def test_cor_roundtrip_and_reference_layout(rng):
    """Byte layout must match the reference receiver's decode:
    struct.unpack('>IIIHHQIHH', pkt[:32]), payload '>i4'
    (corr_full_rx_bifrost_packets.py:28-42)."""
    import struct

    nchan = 8
    data = rng.randint(-2**31, 2**31 - 1, [nchan, 2, 2, 2]).astype(np.int32)
    fn = pk.cor_frame_number(nchan_sum=4, npipeline=32, pipeline_idx=5)
    hdr = pk.CorHeader(frame_number=fn, secs_count=1234, freq_count=960,
                       cor_gain=0, time_tag=2400 * 8192,
                       cor_navg=2400 * 8192, stand_i=3, stand_j=9)
    raw = pk.encode_cor(hdr, data)
    assert len(raw) == 32 + nchan * 2 * 2 * 2 * 4
    # the reference receiver's exact unpack
    (sync, id_frame, secs, freq, gain, time_tag, navg, s_i,
     s_j) = struct.unpack(">IIIHHQIHH", raw[:32])
    assert sync == 0xDEC0DE5C
    assert (id_frame >> 24) == 0x02        # Mark5C COR packet id
    assert (id_frame & 0xFFFFFF) == fn
    assert (fn >> 16) == 4                  # channel decimation
    assert ((fn >> 8) & 0xFF) == 32         # total subbands
    assert (fn & 0xFF) == 5                 # this subband, 1-indexed
    assert (secs, freq, gain) == (1234, 960, 0)
    assert time_tag == navg == 2400 * 8192
    assert (s_i, s_j) == (3, 9)
    payload = np.frombuffer(raw[32:], dtype=">i4").reshape(nchan, 2, 2, 2)
    np.testing.assert_array_equal(payload, data)
    hdr2, data2 = pk.decode_cor(raw)
    assert hdr2 == hdr
    np.testing.assert_array_equal(data2, data)


def _dense_hermitian_vis(rng, nchan, nstand, npol):
    """Random integer Hermitian visibility cube dense[c, i, j] =
    sum_t v_i conj(v_j) (the golden conjugation convention)."""
    ninput = nstand * npol
    v = (rng.randint(-8, 8, [5, nchan, ninput])
         + 1j * rng.randint(-8, 8, [5, nchan, ninput]))
    return np.einsum("tci,tcj->cij", v, v.conj())


def test_cor_full_output_scatter_matches_dense(rng):
    """CorrFullOutput(use_cor_fmt=True) packets, reassembled with the
    reference receiver's scatter-with-conjugation loop, must reproduce the
    full Hermitian visibility cube."""
    from caltech_bifrost_dsp_tpu import config as cfgmod
    from caltech_bifrost_dsp_tpu.io import sink

    cfg = cfgmod.XEngineConfig(nstand=8, nchan=16, ntime_gulp=48,
                               acc_len=240, acc_len_slow=480, nbeam=4,
                               ntime_sum=12, npipeline=4, pipeline_id=2)
    dense = _dense_hermitian_vis(rng, cfg.nchan, cfg.nstand, cfg.npol)
    pkts = []
    out = sink.CorrFullOutput(cfg, send=pkts.append, use_cor_fmt=True)
    n = out.send_matrix(dense, sync_time=1000, spectra_id=2400,
                        acc_len=240)
    assert n == len(pkts) == cfg.nstand * (cfg.nstand + 1) // 2
    cube = pk.cor_scatter_matrix(pkts, cfg.nstand, cfg.npol)
    # cube: [stand, stand, p0, p1, chan, 2]
    want = dense.reshape(cfg.nchan, cfg.nstand, cfg.npol, cfg.nstand,
                         cfg.npol).transpose(1, 2, 3, 4, 0)
    np.testing.assert_array_equal(cube[..., 0],
                                  want.real.transpose(0, 2, 1, 3, 4))
    np.testing.assert_array_equal(cube[..., 1],
                                  want.imag.transpose(0, 2, 1, 3, 4))
    # header arithmetic: ADC-sample time units (fs/chan_bw = 8192)
    hdr, _ = pk.decode_cor(pkts[0])
    sps = int(round(cfg.fs_hz / cfg.chan_bw_hz))
    assert hdr.time_tag == 2400 * sps
    assert hdr.cor_navg == 240 * sps
    assert hdr.freq_count == cfg.chan0
    assert (hdr.frame_number & 0xFF) == 3      # pipeline 2 -> subband 3
    assert (hdr.frame_number >> 16) == 1       # no channel decimation


def test_cor_part_output_enumeration(rng):
    """COR-format fast visibilities: one dual-pol baseline per packet,
    stands from the upper-triangle enumeration (bifrost source-number
    mapping, corr_output_part_block.py:366-401)."""
    from caltech_bifrost_dsp_tpu import config as cfgmod
    from caltech_bifrost_dsp_tpu.io import sink

    cfg = cfgmod.XEngineConfig(nstand=8, nchan=16, ntime_gulp=48,
                               acc_len=240, acc_len_slow=480, nbeam=4,
                               ntime_sum=12, nchan_sum=4, npipeline=4)
    nstand_virt = 4
    nbl = nstand_virt * (nstand_virt + 1) // 2
    nvis = nbl * 4
    nchan_out = cfg.nchan // cfg.nchan_sum
    re = rng.randint(-1000, 1000, [nchan_out, nvis]).astype(np.int32)
    im = rng.randint(-1000, 1000, [nchan_out, nvis]).astype(np.int32)
    pkts = []
    out = sink.CorrPartOutput(cfg, send=pkts.append, use_cor_fmt=True)
    n = out.send_subsel(re, im, baselines=None, sync_time=0,
                        spectra_id=480, acc_len=240)
    assert n == nbl
    k = 0
    for i in range(nstand_virt):
        for j in range(i, nstand_virt):
            hdr, data = pk.decode_cor(pkts[k])
            assert (hdr.stand_i, hdr.stand_j) == (i + 1, j + 1)
            assert (hdr.frame_number >> 16) == cfg.nchan_sum
            want = re[:, 4 * k:4 * k + 4].reshape(nchan_out, 2, 2)
            np.testing.assert_array_equal(data[..., 0], want)
            wanti = im[:, 4 * k:4 * k + 4].reshape(nchan_out, 2, 2)
            np.testing.assert_array_equal(data[..., 1], wanti)
            k += 1
