"""Long-run soak gate (CBD_SOAK=1): production-shaped stability run.

Paced UDP ingest through the native capture into the full pipeline with
every output stream live over real UDP, a mid-run triggered dump
command, and a mid-run sequence break (large timestamp jump, the
packet-loss/resync event the reference recovers from,
corr_block.py:360-372) — the pipeline must keep integrating afterwards,
with bounded memory growth over the whole run.

Skipped by default (wall-clock heavy); enable with ``CBD_SOAK=1``.
Duration/pacing: ``CBD_SOAK_S`` (default 30 s), ``CBD_SOAK_RATE``
(gulps/s offered, default 8).
"""

import glob
import os
import resource
import socket
import threading
import time

import numpy as np
import pytest

import artifacts

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.control.client import (CorrControlClient,
                                                    PipelineControl)
from caltech_bifrost_dsp_tpu.control.monitor import MonitorBridge
from caltech_bifrost_dsp_tpu.control.store import MemoryStore
from caltech_bifrost_dsp_tpu.io import native, packets as pk
from caltech_bifrost_dsp_tpu.io import sink, source
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline

pytestmark = [
    pytest.mark.skipif(os.environ.get("CBD_SOAK") != "1",
                       reason="soak gate: set CBD_SOAK=1 (wall-clock "
                              "heavy, ~CBD_SOAK_S seconds)"),
    pytest.mark.skipif(not native.available(),
                       reason="native library unavailable"),
]

CFG = cfgmod.TINY  # gulp 48, acc 240 (5 gulps), slow 480
CAP_PORT = 19850

#: Machine-readable soak evidence (VERDICT r4 #5): duration, gulps,
#: loss, resync count, dump counts, and the sampled RSS trajectory per
#: leg, written every CBD_SOAK run.
_SOAK_ARTIFACT = artifacts.artifact_path("CBD_SOAK_ARTIFACT",
                                         "SOAK_r05.json")


def _record_soak(leg: str, rec: dict):
    artifacts.record_artifact(_SOAK_ARTIFACT, leg, rec)


class _RssSampler:
    """Samples current RSS (MB, /proc/self/statm) every few seconds —
    the artifact's memory trajectory (ru_maxrss only gives high-water)."""

    def __init__(self, period_s: float = 5.0):
        self.period_s = period_s
        self.samples: list = []
        self._stop = threading.Event()
        self._page = os.sysconf("SC_PAGESIZE")
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def _rss_mb(self) -> float:
        with open("/proc/self/statm") as fh:
            return int(fh.read().split()[1]) * self._page / 1e6

    def _loop(self):
        t0 = time.monotonic()
        while not self._stop.is_set():
            self.samples.append([round(time.monotonic() - t0, 1),
                                 round(self._rss_mb(), 1)])
            self._stop.wait(self.period_s)

    def stop(self) -> list:
        # Event.wait wakes the thread immediately, so the join cannot
        # time out mid-sleep and the returned list is no longer
        # appended to concurrently with json.dump
        self._stop.set()
        self.thread.join(timeout=self.period_s + 5)
        return self.samples

FX_CFG = cfgmod.XEngineConfig(
    nstand=8, nchan=16, ntime_gulp=48, acc_len=240, acc_len_slow=240,
    nbeam=2, ntime_sum=12, nchan_sum=4, pfb_ntap=4, adc_dtype="int8",
    pfb_fft_impl="matmul")
FX_PORT = 19870
TONE = 5


class _CountRx:
    """UDP receiver thread: counts packets, remembers arrival times and
    the raw last packet for stream-specific checks."""

    def __init__(self, port):
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                             32 * 1024 * 1024)
        self.sock.bind(("127.0.0.1", port))
        self.sock.settimeout(1.0)
        self.count = 0
        self.last_t = 0.0
        self.last_pkt = b""
        self.spectra_ids: set = set()
        self._stop = False
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def _loop(self):
        while not self._stop:
            try:
                p = self.sock.recv(65536)
            except socket.timeout:
                continue
            except OSError:
                return
            self.count += 1
            self.last_t = time.monotonic()
            self.last_pkt = p

    def stop(self):
        self._stop = True
        self.thread.join(timeout=5)
        self.sock.close()


def test_soak_full_system(tmp_path):
    duration = float(os.environ.get("CBD_SOAK_S", "30"))
    rate = float(os.environ.get("CBD_SOAK_RATE", "8"))
    ngulp_total = max(int(duration * rate), 16 * 5)
    n_a = ngulp_total // 2            # segment A, then the break
    # segment B must outlast the post-break recovery margins (fast
    # margin 10 accs, slow margin 2 slow windows) plus one full slow
    # window to dump, whatever duration the env chose
    n_b_min = (11 * CFG.acc_len + 4 * CFG.acc_len_slow) \
        // CFG.ntime_gulp
    n_b = max(ngulp_total - n_a, n_b_min)
    gap_gulps = 1000                  # large jump -> capture fast-forwards

    rss = _RssSampler()
    t_run0 = time.monotonic()
    rxs = {name: _CountRx(CAP_PORT + 1 + i)
           for i, name in enumerate(("corr", "part", "pbeam", "ibeam"))}
    store = MemoryStore()
    cap = native.CaptureSource(CFG, "127.0.0.1", CAP_PORT, nbuf=16,
                               poll_s=30.0)
    pipe = XEnginePipeline(
        CFG, cap, store=store,
        corr_outputs=[sink.CorrFullOutput(
            CFG, send=sink.UdpSender("127.0.0.1", CAP_PORT + 1).__call__)],
        subsel_outputs=[sink.CorrPartOutput(
            CFG, send=sink.UdpSender("127.0.0.1", CAP_PORT + 2).__call__)],
        pbeam_outputs=[sink.PBeamOutput(
            CFG, senders={0: sink.UdpSender("127.0.0.1",
                                            CAP_PORT + 3).__call__})],
        ibeam_outputs=[sink.IBeamOutput(
            CFG, send=sink.UdpSender("127.0.0.1", CAP_PORT + 4).__call__)],
        history_nbyte=32 * CFG.gulp_nbyte)
    cli = CorrControlClient(store=store, timeout_s=10.0)
    ctl = PipelineControl(cli, socket.gethostname(), 0)

    rng = np.random.RandomState(7)
    gulp = rng.randint(0, 256, [CFG.ntime_gulp, CFG.nchan, CFG.ninput]
                       ).astype(np.uint8)
    state = {"rss_mid": 0, "dump_files": []}

    def blast():
        t0 = time.monotonic()
        sent = 0

        def send_one(seq0):
            native.transmit_gulp("127.0.0.1", CAP_PORT, gulp, seq0=seq0,
                                 nchan_per_pkt=16, npol_per_pkt=8,
                                 delay_ns=20_000)

        for i in range(n_a):
            time.sleep(max(0.0, t0 + sent / rate - time.monotonic()))
            send_one(i * CFG.ntime_gulp)
            sent += 1
            if sent == n_a // 4:
                # warm + compiled: memory baseline for the growth bound
                state["rss_mid"] = \
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            if sent == n_a // 2:
                # mid-run control action: trigger a history dump
                ctl.triggered_dump.trigger(
                    ntime_per_file=CFG.ntime_gulp, nfile=1,
                    dump_path=str(tmp_path))
        # sequence break: resync far in the future
        base = (n_a + gap_gulps) * CFG.ntime_gulp
        for i in range(n_b):
            time.sleep(max(0.0, t0 + sent / rate - time.monotonic()))
            send_one(base + i * CFG.ntime_gulp)
            sent += 1

    tx = threading.Thread(target=blast, daemon=True)
    tx.start()
    pipe.run(n_a + n_b, timeout_s=duration + 180)
    tx.join(timeout=60)
    stats = cap.stats()
    cap.close()
    time.sleep(1.5)  # let receiver threads drain the tail
    for rx in rxs.values():
        rx.stop()

    rss_end = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    rec = {"requested_duration_s": duration,
           "actual_duration_s": round(time.monotonic() - t_run0, 1),
           "rate_gulps_per_s": rate, "ngulp": n_a + n_b,
           "segment_a_gulps": n_a, "segment_b_gulps": n_b,
           "nmissing": int(stats["nmissing"]),
           "nseq": int(stats["nseq"]),
           "ndump_fast": int(pipe.ndump_fast),
           "wire_packets": {k: rx.count for k, rx in rxs.items()},
           "rss_warm_highwater_mb": round(state["rss_mid"] / 1024.0, 1),
           "rss_end_highwater_mb": round(rss_end / 1024.0, 1),
           "rss_trajectory_s_mb": rss.stop(),
           "pass": False}
    _record_soak("xb_leg", rec)

    # 1. ingest: no loss within either segment (the commanded break is
    #    a resync, not loss) and the break started a new sequence
    assert stats["nmissing"] == 0, stats
    assert stats["nseq"] >= 2, stats

    # 2. the pipeline kept integrating across the break: fast dumps from
    #    BOTH segments.  Post-break dumps resume after the recovery
    #    margin (last_start + (missed+10)*acc, corr_block.py:360-372).
    gulps_per_acc = CFG.acc_len // CFG.ntime_gulp
    margin_gulps = 10 * gulps_per_acc
    want_a = n_a // gulps_per_acc - 2
    want_b = (n_b - margin_gulps) // gulps_per_acc - 2
    assert pipe.ndump_fast >= want_a + max(want_b, 1), (
        pipe.ndump_fast, want_a, want_b)
    # subselection packets carry the window id: prove post-break windows
    hdr, _, _ = pk.decode_corr_part(rxs["part"].last_pkt)
    assert hdr.spectra_id >= (n_a + gap_gulps) * CFG.ntime_gulp, (
        "no post-break subsel window seen on the wire")
    # ... and the SLOW stream must recover too (regression: the slow
    # accumulator's realign previously never restarted after a resync)
    chdr, _ = pk.decode_corr_full(rxs["corr"].last_pkt)
    assert chdr.spectra_id >= (n_a + gap_gulps) * CFG.ntime_gulp, (
        "no post-break slow dump seen on the wire")

    # 3. every output stream flowed, and kept flowing near the end
    end_t = time.monotonic()
    for name, rx in rxs.items():
        assert rx.count > 0, f"{name}: no packets"
        assert end_t - rx.last_t < duration / 2 + 10, (
            f"{name}: stream died mid-run "
            f"({end_t - rx.last_t:.1f}s stale)")

    # 4. the mid-run triggered dump produced a replayable file
    deadline = time.time() + 30
    files = []
    while time.time() < deadline:
        files = sorted(glob.glob(str(tmp_path / "*.tbf")))
        if files and pipe.dump_cmd.stats.get("state") == "idle":
            break
        time.sleep(0.2)
    assert files, "triggered dump produced no file"
    replay = source.TriggerFileSource(files[0])
    rhdr, rdata = replay.read()
    assert rhdr["ntime"] == CFG.ntime_gulp
    assert rdata.size == CFG.gulp_nbyte

    # 5. monitoring is live: the bridge publishes per-block stats
    MonitorBridge(store, pipeline_id=0).publish_once()
    assert store.get_prefix("/mon/"), "monitor bridge published nothing"

    # 6. bounded memory: high-water growth after warmup < 300 MB
    rss_end = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    growth_mb = (rss_end - state["rss_mid"]) / 1024.0
    assert state["rss_mid"] > 0
    assert growth_mb < 300.0, f"RSS high-water grew {growth_mb:.0f} MB"

    rec["rss_growth_mb"] = round(growth_mb, 1)
    rec["pass"] = True
    _record_soak("xb_leg", rec)


def test_soak_fx_mode(tmp_path):
    """North-star-config soak: int8 ADC tone frames over real UDP into
    the FX pipeline (channelization on-chip), paced, with a mid-run
    sequence resync.  The tone must land in the right output channel
    on dumps from BOTH sides of the break, with zero ingest loss and
    bounded memory."""
    cfg = FX_CFG
    duration = float(os.environ.get("CBD_SOAK_S", "30"))
    rate = float(os.environ.get("CBD_SOAK_RATE", "6"))
    gulps_per_acc = cfg.acc_len // cfg.ntime_gulp
    ngulp_total = max(int(duration * rate), 16 * gulps_per_acc)
    n_a = ngulp_total // 2
    # post-break margins: fast 10 accs + slow 2 windows + 1 to dump
    n_b_min = (11 * cfg.acc_len + 4 * cfg.acc_len_slow) \
        // cfg.ntime_gulp
    n_b = max(ngulp_total - n_a, n_b_min)
    gap_gulps = 1000

    rss = _RssSampler()
    t_run0 = time.monotonic()
    rx = _CountRx(FX_PORT + 1)

    class _Grab:
        checkfile = None

        def __init__(self):
            self.dumps = []

        def send_matrix(self, dense, sync_time, seq0, acc_len):
            self.dumps.append((seq0, np.array(dense)))
            return 0

    grab = _Grab()
    # warm the FX program first: the jitted step is a module-level
    # cache, so a short in-process run compiles everything before the
    # paced TX starts (otherwise first-gulp compile latency overruns
    # the capture slot ring and the lost chunk re-breaks the sequence)
    warm = XEnginePipeline(cfg, source.ADCSource(cfg, mode="tone",
                                                 tone_chan=TONE,
                                                 amplitude=50.0),
                           fx_mode=True, quant_scale=0.2,
                           corr_outputs=[_Grab()])
    warm.run(2 * gulps_per_acc, timeout_s=120)

    src = native.AdcCaptureSource(cfg, "127.0.0.1", FX_PORT, nbuf=64,
                                  poll_s=30.0)
    pipe = XEnginePipeline(
        cfg, src, fx_mode=True, quant_scale=0.2,
        corr_outputs=[grab, sink.CorrFullOutput(
            cfg, send=sink.UdpSender("127.0.0.1",
                                     FX_PORT + 1).__call__)])

    gen = source.ADCSource(cfg, mode="tone", tone_chan=TONE,
                           amplitude=50.0)
    L = 2 * cfg.nchan
    frame_gulps = [np.ascontiguousarray(
        gen.gulp(i).reshape(cfg.ntime_gulp, L, cfg.ninput)
        .view(np.uint8)) for i in range(4)]
    state = {"rss_mid": 0}

    def blast():
        t0 = time.monotonic()
        sent = 0

        def send_one(seq0, i):
            native.transmit_gulp(
                "127.0.0.1", FX_PORT, frame_gulps[i % 4], seq0=seq0,
                nchan_per_pkt=L, npol_per_pkt=cfg.ninput,
                delay_ns=20_000)

        for i in range(n_a):
            time.sleep(max(0.0, t0 + sent / rate - time.monotonic()))
            send_one(i * cfg.ntime_gulp, i)
            sent += 1
            if sent == n_a // 4:
                state["rss_mid"] = \
                    resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        base = (n_a + gap_gulps) * cfg.ntime_gulp
        for i in range(n_b):
            time.sleep(max(0.0, t0 + sent / rate - time.monotonic()))
            send_one(base + i * cfg.ntime_gulp, i)
            sent += 1

    tx = threading.Thread(target=blast, daemon=True)
    tx.start()
    pipe.run(n_a + n_b, timeout_s=duration + 180)
    tx.join(timeout=60)
    stats = src.stats()
    src.close()
    time.sleep(1.5)
    rx.stop()

    rss_end_hw = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    gap_base = (n_a + gap_gulps) * cfg.ntime_gulp
    pre = [d for s, d in grab.dumps if s < n_a * cfg.ntime_gulp]
    post = [d for s, d in grab.dumps if s >= gap_base]
    rec = {"requested_duration_s": duration,
           "actual_duration_s": round(time.monotonic() - t_run0, 1),
           "rate_gulps_per_s": rate, "ngulp": n_a + n_b,
           "segment_a_gulps": n_a, "segment_b_gulps": n_b,
           "nmissing": int(stats["nmissing"]),
           "nseq": int(stats["nseq"]),
           "ndumps_pre_break": len(pre), "ndumps_post_break": len(post),
           "wire_packets": rx.count,
           "rss_warm_highwater_mb": round(state["rss_mid"] / 1024.0, 1),
           "rss_end_highwater_mb": round(rss_end_hw / 1024.0, 1),
           "rss_trajectory_s_mb": rss.stop(),
           "pass": False}
    _record_soak("fx_leg", rec)

    assert stats["nmissing"] == 0, stats
    assert stats["nseq"] >= 2, stats
    assert rx.count > 0, "no corr packets on the wire"

    # dumps from both segments, tone in channel TONE on each side
    assert pre, "no pre-break dump"
    assert post, ("no post-break dump (recovery margin not cleared "
                  f"within segment B: {len(grab.dumps)} dumps)")
    for mat in (pre[-1], post[-1]):
        autos = np.real(mat[:, 0, 0]) if mat.ndim == 3 else \
            np.real(np.einsum("ciipp->c", mat))
        assert int(np.argmax(autos)) == TONE

    rss_end = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    growth_mb = (rss_end - state["rss_mid"]) / 1024.0
    assert state["rss_mid"] > 0
    assert growth_mb < 300.0, f"RSS high-water grew {growth_mb:.0f} MB"

    rec["rss_growth_mb"] = round(growth_mb, 1)
    rec["pass"] = True
    _record_soak("fx_leg", rec)
