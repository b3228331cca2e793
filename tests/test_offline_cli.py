"""Offline CLI round-trips: triggered dump -> upchan-bf / upchan-imag."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.io import sink, source
from caltech_bifrost_dsp_tpu.runtime.ring import HistoryRing
from caltech_bifrost_dsp_tpu.scripts import upchan_bf, upchan_imag

CFG = cfgmod.XEngineConfig(nstand=8, nchan=4, ntime_gulp=64, acc_len=128,
                           acc_len_slow=256, nbeam=4, ntime_sum=16,
                           nchan_sum=4, npipeline=2)


@pytest.fixture
def dumpfile(tmp_path, rng):
    frame_nbyte = CFG.nchan * CFG.ninput
    ring = HistoryRing(nbyte=256 * frame_nbyte, frame_nbyte=frame_nbyte)
    hdr = source.sequence_header(CFG, seq0=0)
    ring.set_header(hdr, frame0_seq=0)
    for _ in range(256):
        ring.push(rng.randint(0, 256, frame_nbyte).astype(np.uint8))
    dumper = sink.TriggeredDump(ring, dump_path=str(tmp_path))
    files = dumper.trigger(ntime_per_file=256, nfile=1)
    return files[0]


def test_upchan_bf_cli(tmp_path, dumpfile):
    out = str(tmp_path / "beams.h5")
    rc = upchan_bf.main(["--datain", dumpfile, "--output", out,
                         "--ra-array", "10.0,20.0",
                         "--dec-array", "30.0,40.0",
                         "--nupchan", "8", "--gulp", "64"])
    assert rc == 0
    with h5py.File(out) as fh:
        assert fh["power"].shape[1] == 2            # beams
        assert fh["power"].shape[2] == CFG.nchan * 8  # fine channels
        assert fh["power"].shape[0] == 256 // 64    # gulps
        assert np.isfinite(fh["power"][:]).all()


def test_upchan_imag_cli(tmp_path, dumpfile):
    out = str(tmp_path / "vis.h5")
    rc = upchan_imag.main(["--datain", dumpfile, "--output", out,
                           "--nupchan", "8", "--gulp", "64",
                           "--start-freq", "0", "--end-freq", "16",
                           "--nframe-per-integration", "16"])
    assert rc == 0
    with h5py.File(out) as fh:
        vis = fh["vis"][:]
        assert vis.shape[1:] == (16, CFG.ninput, CFG.ninput)
        # Hermitian integrations
        np.testing.assert_allclose(
            vis, np.conj(np.swapaxes(vis, 2, 3)), atol=1e-2)


def test_upchan_bf_cli_full_obs(tmp_path, dumpfile):
    """--full-obs writes the preallocated whole-observation file."""
    prefix = str(tmp_path / "obs")
    rc = upchan_bf.main(["--datain", dumpfile, "--output", prefix,
                         "--ra-array", "10.0", "--dec-array", "30.0",
                         "--nupchan", "8", "--gulp", "64",
                         "--full-obs", "--obs-nsamples", "16"])
    assert rc == 0
    fname = prefix + "_10.00_30.00.hdf5"
    with h5py.File(fname) as fh:
        obs = fh["Observation1"]
        assert obs.attrs["RA"] == 10.0
        I = obs["Tuning1/I"][:]
        assert I.shape == (16, CFG.nchan * 8)
        assert np.isfinite(I).all() and I[:4].sum() > 0
        assert obs["time"].shape == (16,)
