"""Offline upchannelizing beamformer + imaging correlator pipelines."""

import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu.io.hdf5 import (AccumBeamHDF5Writer,
                                             BeamHDF5Writer,
                                             VisibilityHDF5Writer)
from caltech_bifrost_dsp_tpu.models import offline
from caltech_bifrost_dsp_tpu.utils import skycoords
from caltech_bifrost_dsp_tpu.utils.codec import pack_np, unpack_complex_np

NTIME, NCHAN, NSTAND, NPOL, NUP = 128, 4, 6, 2, 8


def _packed_voltages(rng):
    re = rng.randint(-8, 8, [NTIME, NCHAN, NSTAND, NPOL])
    im = rng.randint(-8, 8, [NTIME, NCHAN, NSTAND, NPOL])
    return pack_np(re, im)


def _beamcfg(rng, nbeam=2):
    enz = rng.standard_normal([NSTAND, 3]) * 100
    return offline.OfflineBeamConfig(
        nbeam=nbeam, ra_deg=[10.0 * b for b in range(nbeam)],
        dec_deg=[30.0 + b for b in range(nbeam)], enz_positions=enz,
        nupchan=NUP)


def test_zenith_beam_sums_antennas_coherently(rng):
    """A beam pointed at zenith has zero geometric delay for all antennas;
    with unit gains the beamformed output equals the plain antenna sum."""
    enz = rng.standard_normal([NSTAND, 3]) * 50
    delays = skycoords.geometric_delays_s(enz, az=0.3, alt=np.pi / 2)
    # at alt=90deg direction == zenith -> all delays equal (max-normalized
    # to 0)
    np.testing.assert_allclose(delays, 0, atol=1e-18)


def test_upchan_beamform_run_matches_numpy(rng):
    packed = _packed_voltages(rng)
    cfg = _beamcfg(rng)
    sfreq, chan_bw = 50e6, 25e3
    freqs, outs = offline.upchan_beamform_run(
        packed, cfg, sfreq, chan_bw, t_unix=1.7e9, gulp_ntime=64,
        accumulate=False)
    assert len(outs) == NTIME // 64
    assert outs[0].shape == (64 // NUP, cfg.nbeam, NCHAN * NUP)
    # numpy reference for gulp 0
    v = unpack_complex_np(packed[:64]).astype(np.complex64)
    frames = v.reshape(64 // NUP, NUP, NCHAN, NSTAND, NPOL)
    fine = np.fft.fftshift(np.fft.fft(frames, axis=1), axes=1)
    fine = fine.transpose(0, 2, 1, 3, 4)  # [T, chan, fine, s, p]
    w = offline.compute_offline_weights(cfg, freqs, 1.7e9)
    x = fine.reshape(64 // NUP, NCHAN * NUP, NSTAND * NPOL)
    want = np.einsum("tfi,bfi->tbf", x, w)
    np.testing.assert_allclose(outs[0], want, rtol=1e-3, atol=1e-3)


def test_upchan_imaging_run_integrates(rng):
    packed = _packed_voltages(rng)
    out = offline.upchan_imaging_run(packed, nupchan=NUP,
                                     chan_range=(4, 12),
                                     nframe_per_integration=8,
                                     gulp_ntime=64)
    # 128 samples -> 16 fine-time frames -> 2 integrations of 8
    assert len(out) == 2
    assert out[0].shape == (8, NSTAND * NPOL, NSTAND * NPOL)
    # Hermitian
    np.testing.assert_allclose(out[0],
                               np.conj(np.swapaxes(out[0], 1, 2)),
                               atol=1e-3)


def test_hdf5_writers_roundtrip(tmp_path, rng):
    import h5py

    freqs = np.arange(32) * 1e3
    bw = BeamHDF5Writer(str(tmp_path / "beams.h5"), nbeam=2, freqs_hz=freqs)
    data = (rng.standard_normal([6, 2, 32])
            + 1j * rng.standard_normal([6, 2, 32])).astype(np.complex64)
    bw.append(data)
    bw.append(data)
    bw.close()
    with h5py.File(tmp_path / "beams.h5") as fh:
        assert fh["beam1"].shape == (12, 32)
        np.testing.assert_array_equal(fh["beam0"][:6], data[:, 0])

    aw = AccumBeamHDF5Writer(str(tmp_path / "acc.h5"), nbeam=2,
                             freqs_hz=freqs)
    aw.append(np.abs(data[0]).astype(np.float32), 123.0)
    aw.close()
    with h5py.File(tmp_path / "acc.h5") as fh:
        assert fh["power"].shape == (1, 2, 32)
        assert fh["time"][0] == 123.0

    vw = VisibilityHDF5Writer(str(tmp_path / "vis.h5"), freqs_hz=freqs[:4],
                              ninput=6)
    vis = rng.standard_normal([4, 6, 6]).astype(np.complex64)
    vw.append(vis, 5.0)
    vw.close()
    with h5py.File(tmp_path / "vis.h5") as fh:
        np.testing.assert_array_equal(fh["vis"][0], vis)


def test_radec_altaz_fallback_sane():
    """Pole star stays near the pole: alt ~ latitude for Polaris-ish
    coords from any longitude/time."""
    az, alt = skycoords.radec_to_altaz(37.95, 89.26, 1.7e9, 37.24,
                                       -118.28)
    assert abs(np.degrees(alt) - 37.24) < 2.0
