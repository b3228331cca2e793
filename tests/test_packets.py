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
