"""Input sources: synthetic generator (DummySource parity), golden-file
replay, triggered-dump replay, and a UDP snap2 capture.

The reference's testing-first ingest path is DummySource (ramp / test-file
data with Gb/s throttling and a ``skip_write`` mode for downstream
benchmarking, reference: blocks/dummy_source_block.py) and TriggerReplay
(re-ingesting TriggeredDump files, reference: blocks/trigger_source_block.py);
production ingest is the C packet capture
(reference: blocks/capture_block.py).  All of them emit sequences whose
JSON headers carry the fields built by ``Capture.seq_callback``
(capture_block.py:262-292).
"""

from __future__ import annotations

import json
import time

import numpy as np

from ..config import XEngineConfig
from ..verification import golden


def sequence_header(cfg: XEngineConfig, seq0: int, sync_time: int = 0,
                    time_tag: int = 1, chan0: int | None = None) -> dict:
    """The capture sequence header (capture_block.py:262-292)."""
    chan0 = cfg.chan0 if chan0 is None else chan0
    return {
        "time_tag": time_tag,
        "sync_time": sync_time,
        "seq0": seq0,
        "chan0": chan0,
        "nchan": cfg.nchan,
        "system_nchan": cfg.system_nchan,
        "fs_hz": cfg.fs_hz,
        "sfreq": chan0 * cfg.chan_bw_hz,
        "bw_hz": cfg.nchan * cfg.chan_bw_hz,
        "nstand": cfg.nstand,
        "pipeline_id": cfg.pipeline_id,
        "npol": cfg.npol,
        "complex": True,
        "nbit": 4,
    }


class DummySource:
    """Synthetic gulp generator with throughput throttling.

    Parity with reference: blocks/dummy_source_block.py — modes:
    ``ramp`` (byte counter), ``testfile`` (loops a golden input file,
    get_testfile_gulp:207), ``random``; ``target_throughput`` caps emission
    in Gb/s (lines 275-283); ``skip_write`` emits zero-filled buffers
    without generation cost for downstream benchmarking (lines 130-135).
    """

    def __init__(self, cfg: XEngineConfig, mode: str = "ramp",
                 testfile: str | None = None, seed: int = 0xdeadbeef,
                 target_throughput_gbps: float = 1000.0,
                 skip_write: bool = False):
        self.cfg = cfg
        self.mode = mode
        self.skip_write = skip_write
        self.target_gbps = target_throughput_gbps
        self._rng = np.random.RandomState(seed)
        self._testdata = None
        self._test_ntime = 0
        if mode == "testfile":
            if testfile is None:
                raise ValueError("testfile mode needs a path")
            meta, data = golden.read_dat(testfile)
            ntime, nchan, nstand, npol = meta["shape"]
            if nchan < cfg.nchan or nstand < cfg.nstand:
                raise ValueError("test file smaller than configured system")
            self._testdata = data[:, :cfg.nchan, :cfg.nstand, :cfg.npol] \
                .reshape(ntime, cfg.nchan, cfg.nstand * cfg.npol)
            self._test_ntime = ntime
        self._emitted_bits = 0
        self._t_start = None
        self._fill_i = 0
        self._ramp = None
        self._zeroed_slots: dict = {}  # key -> weakref(backing)

    def header(self, seq0: int = 0, **kw) -> dict:
        return sequence_header(self.cfg, seq0, **kw)

    def get_testfile_gulp(self, t: int) -> np.ndarray:
        """Loop the test file in gulp-sized chunks (dummy_source_block.py:207).
        """
        g = self.cfg.ntime_gulp
        lo = (t * g) % self._test_ntime
        out = np.empty((g, self.cfg.nchan, self.cfg.ninput), np.uint8)
        done = 0
        while done < g:
            n = min(g - done, self._test_ntime - lo)
            out[done:done + n] = self._testdata[lo:lo + n]
            done += n
            lo = (lo + n) % self._test_ntime
        return out

    def gulp(self, index: int) -> np.ndarray:
        """Produce gulp ``index`` (uint8 [ntime_gulp, nchan, ninput]),
        throttled to target_throughput."""
        cfg = self.cfg
        shape = (cfg.ntime_gulp, cfg.nchan, cfg.ninput)
        if self.skip_write:
            data = np.zeros(shape, np.uint8)
        elif self.mode == "ramp":
            n = int(np.prod(shape))
            start = index * n
            data = ((start + np.arange(n)) & 0xFF).astype(np.uint8) \
                .reshape(shape)
        elif self.mode == "testfile":
            data = self.get_testfile_gulp(index)
        elif self.mode == "random":
            data = self._rng.randint(0, 255, shape, dtype=np.uint8)
        else:
            raise ValueError(f"unknown mode {self.mode}")
        self._throttle(data.nbytes)
        return data

    def _throttle(self, nbytes: int) -> None:
        # Throttle (dummy_source_block.py:275-283)
        now = time.monotonic()
        if self._t_start is None:
            self._t_start = now
        self._emitted_bits += 8 * nbytes
        min_elapsed = self._emitted_bits / (self.target_gbps * 1e9)
        sleep = min_elapsed - (now - self._t_start)
        if sleep > 0:
            time.sleep(sleep)

    def fill_into(self, dest: np.ndarray):
        """Zero-copy source protocol: write the next gulp directly into
        the caller's buffer (a staging-ring reservation,
        ring.Ring.reserve_span) and return its seq0.  ``skip_write``
        skips even the memset once a recycled ring slot is known to
        hold only our zeros — the no-generation-cost contract of the
        reference's skip_write (dummy_source_block.py:130-135)."""
        cfg = self.cfg
        out = dest.view(np.uint8).reshape(
            cfg.ntime_gulp, cfg.nchan, cfg.ninput)
        i = self._fill_i
        self._fill_i += 1
        if self.skip_write:
            # identity = (root backing object, offset, size): a raw
            # address key could alias a RECYCLED allocation holding
            # garbage after a ring rebuild.  The weakref pins the
            # backing's id for as long as the cache entry lives.
            import weakref

            base = dest
            while base.base is not None:
                base = base.base
            key = (id(base), dest.__array_interface__["data"][0],
                   dest.nbytes)
            ref = self._zeroed_slots.get(key)
            if ref is None or ref() is not base:
                out[...] = 0
                self._zeroed_slots[key] = weakref.ref(base)
        elif self.mode == "ramp":
            flat = out.reshape(-1)
            if self._ramp is None or self._ramp.size != flat.size:
                self._ramp = (np.arange(flat.size) & 0xFF).astype(np.uint8)
            # uint8 wraparound add == (start + arange) & 0xFF
            np.add(self._ramp, np.uint8((i * flat.size) & 0xFF), out=flat)
        elif self.mode == "testfile":
            out[...] = self.get_testfile_gulp(i)
        elif self.mode == "random":
            out[...] = self._rng.randint(
                0, 255, out.shape, dtype=np.uint8)
        else:
            raise ValueError(f"unknown mode {self.mode}")
        self._throttle(out.nbytes)
        return i * cfg.ntime_gulp

    def stream(self, ngulp: int, seq0: int = 0):
        """Yield (this_gulp_time, gulp) pairs; ngulp == 0 runs forever."""
        i = 0
        while ngulp == 0 or i < ngulp:
            yield seq0 + i * self.cfg.ntime_gulp, self.gulp(i)
            i += 1


class ADCSource:
    """Raw ADC sample generator for the FX (channelizer-included) mode.

    Emits gulps of ``ntime_gulp * 2 * nchan`` ADC samples per correlator
    gulp, [nsamp, ninput], in ``cfg.adc_dtype`` (f32, or int8 — the
    production-faithful 8-bit digitizer path, where the synthetic signal
    is rounded to integer ADC counts).  Modes: 'noise', or 'tone'
    placing a sinusoid in channel ``tone_chan`` on every input.
    """

    def __init__(self, cfg: XEngineConfig, mode: str = "noise",
                 tone_chan: int = 5, amplitude: float = 4.0,
                 seed: int = 0xF00D):
        self.cfg = cfg
        self.mode = mode
        self.tone_chan = tone_chan
        self.amplitude = amplitude
        self.dtype = cfg.adc_np_dtype
        self._rng = np.random.RandomState(seed)
        self.samples_per_gulp = cfg.ntime_gulp * 2 * cfg.nchan
        self._fill_i = 0

    def header(self, seq0: int = 0, **kw) -> dict:
        h = sequence_header(self.cfg, seq0, **kw)
        h["nbit"] = 8 * self.dtype.itemsize
        h["adc"] = True
        h["complex"] = False  # raw ADC samples are REAL: a consumer
        # deriving bytes-per-sample from nbit x (2 if complex) would
        # misparse archived dumps otherwise
        return h

    def _cast(self, x: np.ndarray) -> np.ndarray:
        if self.dtype == np.int8:
            return np.clip(np.rint(x), -127, 127).astype(np.int8)
        return x.astype(np.float32)

    def _signal(self, index: int) -> np.ndarray:
        cfg = self.cfg
        n = self.samples_per_gulp
        if self.mode == "tone":
            t = np.arange(index * n, (index + 1) * n, dtype=np.float64)
            x = self.amplitude * np.cos(
                2 * np.pi * self.tone_chan / (2 * cfg.nchan) * t)
            return np.broadcast_to(self._cast(x)[:, None],
                                   (n, cfg.ninput))
        return self._cast(self._rng.standard_normal([n, cfg.ninput])
                          * self.amplitude)

    def gulp(self, index: int) -> np.ndarray:
        return np.ascontiguousarray(self._signal(index))

    def stream(self, ngulp: int, seq0: int = 0):
        i = 0
        while ngulp == 0 or i < ngulp:
            yield seq0 + i * self.cfg.ntime_gulp, self.gulp(i)
            i += 1

    def fill_into(self, dest: np.ndarray):
        """Zero-copy source protocol (see DummySource.fill_into): write
        the next ADC gulp into the caller's staging reservation."""
        cfg = self.cfg
        n = self.samples_per_gulp
        out = dest.view(self.dtype).reshape(n, cfg.ninput)
        i = self._fill_i
        self._fill_i += 1
        out[...] = self._signal(i)
        return i * cfg.ntime_gulp


class TriggerFileSource:
    """Replay a TriggeredDump file as a sequence
    (reference: blocks/trigger_source_block.py:73 TriggerReplay).

    File layout (triggered_dump_block.py:131-151): 8-byte little-endian
    total-size prefix, JSON header padded to 1 MB, then raw ring frames.
    """

    HEADER_BLOCK = 1024 * 1024

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as fh:
            size = int.from_bytes(fh.read(8), "little")
            raw = fh.read(self.HEADER_BLOCK - 8)
            self.header = json.loads(raw.split(b"\x00", 1)[0].decode())
            self.payload_nbyte = size - self.HEADER_BLOCK

    def read(self) -> tuple[dict, np.ndarray]:
        with open(self.path, "rb") as fh:
            fh.seek(self.HEADER_BLOCK)
            raw = fh.read(self.payload_nbyte)
        h = self.header
        if h.get("adc"):
            adc_dt = np.int8 if h.get("nbit", 32) == 8 else np.float32
            data = np.frombuffer(raw, adc_dt)
            return h, data.reshape(h["ntime"], h["nstand"] * h["npol"])
        data = np.frombuffer(raw, np.uint8)
        shape = (h["ntime"], h["nchan"], h["nstand"] * h["npol"])
        return h, data.reshape(shape)

    def gulps(self, ntime_gulp: int):
        h, data = self.read()
        seq0 = h.get("seq0", 0)
        for g in range(data.shape[0] // ntime_gulp):
            yield (seq0 + g * ntime_gulp,
                   data[g * ntime_gulp:(g + 1) * ntime_gulp])


class UdpSnap2Source:
    """Socket-based snap2 packet capture reassembling gulps.

    The software fallback of the reference's C UDPCapture/UDPVerbsCapture
    engine (capture_block.py:180-189): packets for the same ``seq`` are
    placed at [time, chan_block, pol_block]; a new sequence starts on
    timestamp discontinuity.  (The high-rate native path lives in
    ``native/``; this pure-Python version serves tests and low-rate use.)
    """

    def __init__(self, cfg: XEngineConfig, sock, ntime_gulp: int | None = None,
                 timeout_s: float = 5.0):
        from . import packets as pk

        self.cfg = cfg
        self.sock = sock
        self.pk = pk
        self.ntime_gulp = ntime_gulp or cfg.ntime_gulp
        self.timeout_s = timeout_s
        sock.settimeout(timeout_s)
        self._pending: dict[int, np.ndarray] = {}
        self._filled: dict[int, set] = {}  # per-gulp landing keys
        self.ngood_bytes = 0
        self.nmissing = 0

    _MAX_PENDING_GULPS = 4  # stash window for early next-gulp packets

    def capture_gulp(self, seq_start: int) -> np.ndarray:
        """Blocking: assemble the gulp covering [seq_start, seq_start+g).
        Missing packets are left as zeros (counted in ``nmissing``).

        Packets for LATER gulps drained while completing this one are
        stashed (up to ``_MAX_PENDING_GULPS`` ahead) and pre-loaded when
        their gulp is requested — dropping them would turn ordinary
        interleaving at gulp boundaries into systematic fake loss."""
        cfg = self.cfg
        g = self.ntime_gulp
        # prune stashes the caller skipped past (a resync jumping the
        # request forward would otherwise leak full-gulp buffers
        # forever in a long-running capture)
        for k in [k for k in self._pending if k < seq_start]:
            self._pending.pop(k, None)
            self._filled.pop(k, None)
        buf = self._pending.pop(seq_start, None)
        # landing sets, not counters: a duplicated datagram must not
        # advance completion (it would end the loop early with a
        # genuinely lost packet's region silently zero and nmissing 0)
        landed = self._filled.pop(seq_start, None) or set()
        if buf is None:
            buf = np.zeros((g, cfg.nchan, cfg.ninput), np.uint8)
        expected = getattr(self, "_expected", None)
        deadline = time.monotonic() + self.timeout_s
        while time.monotonic() < deadline:
            if expected is not None and len(landed) >= expected:
                break
            try:
                pkt = self.sock.recv(65536)
            except OSError:
                break
            hdr, payload = self.pk.decode_snap2(pkt)
            if expected is None:
                npkt_per_time = ((cfg.nchan // hdr.nchan)
                                 * (cfg.ninput // hdr.npol))
                expected = self._expected = npkt_per_time * g
            t = hdr.seq - seq_start
            if t < 0:
                continue  # stale packet from an already-emitted gulp
            c0 = hdr.chan_block_id * hdr.nchan
            # key is relative to the packet's OWNING gulp (t % g), not the
            # current seq_start: a stashed key must match the key the same
            # region gets once that gulp becomes current, or duplicates
            # crossing a gulp boundary double-count and end assembly early
            key = (int(t % g), int(c0), int(hdr.pol0))
            if t >= g:  # early packet for a future gulp: stash it
                if t >= g * (self._MAX_PENDING_GULPS + 1):
                    continue
                base = seq_start + (t // g) * g
                pend = self._pending.get(base)
                if pend is None:
                    pend = self._pending[base] = np.zeros_like(buf)
                    self._filled[base] = set()
                if key in self._filled[base]:
                    continue  # duplicate
                self._filled[base].add(key)
                pend[t - (base - seq_start), c0:c0 + hdr.nchan,
                     hdr.pol0:hdr.pol0 + hdr.npol] = payload
                self.ngood_bytes += payload.nbytes
                continue
            if key in landed:
                continue  # duplicate
            landed.add(key)
            buf[t, c0:c0 + hdr.nchan,
                hdr.pol0:hdr.pol0 + hdr.npol] = payload
            self.ngood_bytes += payload.nbytes
        if expected is not None and len(landed) < expected:
            self.nmissing += expected - len(landed)
        return buf
