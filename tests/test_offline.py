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


def test_full_observation_hdf5_writer(tmp_path):
    """Preallocated whole-observation file (HDF5FullSaveBlock analog):
    shape/attrs round-trip, multi-range scatter, reopen-append."""
    import h5py

    from caltech_bifrost_dsp_tpu.io.hdf5 import FullObservationHDF5Writer

    nsamp, nfreq = 64, 48
    prefix = str(tmp_path / "obs")
    w = FullObservationHDF5Writer(
        prefix, ra=12.3456, dec=-45.6789, tstart_unix=1_700_000_000.0,
        tstep_s=0.5, total_nsamples=nsamp, sfreq_hz=50e6,
        fstep_hz=1000.0, total_nfreq=nfreq)
    assert w.filename.endswith("obs_12.35_-45.68.hdf5")
    blk1 = np.arange(8 * 16, dtype=np.float32).reshape(8, 16)
    w.write(blk1, t_unix=1_700_000_000.0 + 4 * 0.5, sfreq_hz=50e6)
    # a second channel range of the same observation
    blk2 = np.full((8, 16), 7.0, np.float32)
    w.write(blk2, t_unix=1_700_000_000.0 + 4 * 0.5,
            sfreq_hz=50e6 + 32 * 1000.0)
    w.close()

    # reopen-append (the 'a' mode semantics the reference relies on)
    w2 = FullObservationHDF5Writer(
        prefix, ra=12.3456, dec=-45.6789, tstart_unix=1_700_000_000.0,
        tstep_s=0.5, total_nsamples=nsamp, sfreq_hz=50e6,
        fstep_hz=1000.0, total_nfreq=nfreq)
    w2.write(np.ones((4, 16), np.float32) * 3,
             t_unix=1_700_000_000.0 + 20 * 0.5, sfreq_hz=50e6)
    w2.close()

    with h5py.File(w.filename, "r") as fh:
        obs = fh["Observation1"]
        assert obs.attrs["RA"] == 12.3456
        assert obs.attrs["nChan"] == nfreq
        assert obs.attrs["RBW"] == 1000.0
        I = obs["Tuning1/I"][:]
        assert I.shape == (nsamp, nfreq)
        np.testing.assert_array_equal(I[4:12, 0:16], blk1)
        np.testing.assert_array_equal(I[4:12, 32:48], blk2)
        np.testing.assert_array_equal(I[20:24, 0:16], 3.0)
        assert I[0].sum() == 0  # untouched rows stay zero-filled
        freq = obs["Tuning1/freq"][:]
        assert freq[0] == 50e6 and len(freq) == nfreq
        t = obs["time"][:]
        assert t["int"][0] == 1_700_000_000
        assert obs["time"].attrs["format"] == "unix"
