"""HDF5 sinks for the offline pipelines.

Analogs of the reference's offline output blocks
(reference: blocks/beamform_offline_output_block.py — ``HDF5FullSaveBlock``
(preallocated observation file), ``HDF5SaveBlock`` (per-beam dynamic
datasets), ``AccumHDF5SaveBlock`` (time-averaged) — and
``VisibilitySaveBlock`` at blocks/imaging_offline_output_block.py:6).
"""

from __future__ import annotations

import numpy as np


class BeamHDF5Writer:
    """Per-beam dynamic beam-voltage/power datasets
    (HDF5SaveBlock semantics)."""

    def __init__(self, path: str, nbeam: int, freqs_hz: np.ndarray,
                 dtype=np.complex64):
        import h5py

        self.fh = h5py.File(path, "w")
        self.fh.create_dataset("frequencies", data=np.asarray(freqs_hz))
        self.dsets = []
        nf = len(freqs_hz)
        for b in range(nbeam):
            self.dsets.append(self.fh.create_dataset(
                "beam%d" % b, shape=(0, nf), maxshape=(None, nf),
                dtype=dtype, chunks=(64, nf)))

    def append(self, beams: np.ndarray) -> None:
        """beams: [T, nbeam, nfreq]."""
        T = beams.shape[0]
        for b, ds in enumerate(self.dsets):
            n = ds.shape[0]
            ds.resize(n + T, axis=0)
            ds[n:] = beams[:, b]

    def close(self) -> None:
        self.fh.close()


class AccumBeamHDF5Writer:
    """Time-averaged beam powers (AccumHDF5SaveBlock semantics)."""

    def __init__(self, path: str, nbeam: int, freqs_hz: np.ndarray):
        import h5py

        self.fh = h5py.File(path, "w")
        self.fh.create_dataset("frequencies", data=np.asarray(freqs_hz))
        nf = len(freqs_hz)
        self.ds = self.fh.create_dataset(
            "power", shape=(0, nbeam, nf), maxshape=(None, nbeam, nf),
            dtype=np.float32, chunks=(16, nbeam, nf))
        self.times = self.fh.create_dataset(
            "time", shape=(0,), maxshape=(None,), dtype=np.float64)

    def append(self, power: np.ndarray, t_unix: float) -> None:
        """power: [nbeam, nfreq] one accumulated spectrum."""
        n = self.ds.shape[0]
        self.ds.resize(n + 1, axis=0)
        self.ds[n] = power
        self.times.resize(n + 1, axis=0)
        self.times[n] = t_unix

    def close(self) -> None:
        self.fh.close()


class VisibilityHDF5Writer:
    """Integrated visibilities + freq/time axes (VisibilitySaveBlock)."""

    def __init__(self, path: str, freqs_hz: np.ndarray, ninput: int):
        import h5py

        self.fh = h5py.File(path, "w")
        self.fh.create_dataset("freq", data=np.asarray(freqs_hz))
        nf = len(freqs_hz)
        self.vis = self.fh.create_dataset(
            "vis", shape=(0, nf, ninput, ninput),
            maxshape=(None, nf, ninput, ninput), dtype=np.complex64,
            chunks=(1, min(nf, 16), ninput, ninput))
        self.times = self.fh.create_dataset(
            "time", shape=(0,), maxshape=(None,), dtype=np.float64)

    def append(self, vis: np.ndarray, t_unix: float) -> None:
        n = self.vis.shape[0]
        self.vis.resize(n + 1, axis=0)
        self.vis[n] = vis
        self.times.resize(n + 1, axis=0)
        self.times[n] = t_unix

    def close(self) -> None:
        self.fh.close()
