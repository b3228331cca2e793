"""Pipeline assembly: source -> fused device step -> product sinks.

The analog of the reference's ``build_pipeline`` + 13 threads
(reference: pipeline/scripts/lwa352-pipeline.py:57-311), collapsed to three
host threads around one device program:

- ingest: pulls gulps from the source into a staging ring (and the deep
  trigger-history ring),
- compute: drives the fused X-engine step with arming flags and pushes
  dump products onto the output queue,
- output: packetizes/sends products (COR / partial / PBEAM / IBEAM).

Every stage keeps the reference's control surface (typed command keys with
staged application) and its perf taxonomy (acquire / reserve / process /
gbps).
"""

from __future__ import annotations

import json
import os
import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np

from ..config import XEngineConfig
from ..control.command import CommandBlock
from ..models import xengine
from ..ops import beamform as bf
from ..ops import corr_subsel as cs
from ..ops import correlate
from ..utils.proclog import PerfTimer
from .arming import Action, IntegrationController
from .ring import HistoryRing, Ring


class CorrCommandBlock(CommandBlock):
    """Corr control endpoint wired to an IntegrationController
    (command keys per reference: corr_block.py:243-246)."""

    def __init__(self, name, ctrl: IntegrationController, granularity,
                 store=None, autostartat=0, acc_len=2400):
        super().__init__(name, store=store)
        self.ctrl = ctrl
        self.define_command_key(
            "start_time", type=int, initial_val=autostartat,
            condition=lambda x: (x == -1) or (x % granularity == 0))
        self.define_command_key(
            "acc_len", type=int, initial_val=acc_len,
            condition=lambda x: x % granularity == 0)
        self.update_stats({"xgpu_acc_len": granularity})

    def apply_pending(self):
        if self.update_pending:
            self.update_command_vals()
            self.ctrl.command(start_time=self.command_vals["start_time"],
                              acc_len=self.command_vals["acc_len"])


class BeamformCommandBlock(CommandBlock):
    """Beamform coefficient endpoint: triple-buffered gain staging with
    per-beam scheduled load samples
    (reference: beamform_block.py:230-242, 320-362, 416-434)."""

    def __init__(self, cfg: XEngineConfig, store=None):
        super().__init__("Beamform", store=store, apply_immediately=True)
        self.cfg = cfg
        self.cal_gains = np.ones(
            (cfg.nchan, cfg.nbeam, cfg.ninput), np.complex64)
        self.gains_new = np.zeros_like(self.cal_gains)
        self.gains_active = np.zeros_like(self.cal_gains)
        # -2 = no load pending; -1 = load immediately; >= 0 = load once
        # the stream reaches that sample (0 is a VALID schedule: "from
        # stream start" — it must not double as the idle sentinel)
        self.gains_load_sample = np.full(cfg.nbeam, -2, np.int64)
        self.freqs = (cfg.chan0 + np.arange(cfg.nchan)) * cfg.chan_bw_hz
        self.copy_pending = True
        self.define_command_key("coeffs", type=dict, initial_val={})
        self._on_command_applied = self._apply_coeffs
        for b in range(cfg.nbeam):
            self.update_stats({"cal_gains%d" % b: [False] * cfg.ninput})

    def _apply_coeffs(self, pending: dict):
        v = pending.get("coeffs") or {}
        try:
            if v.get("type") == "calgains":
                i, b = v["input_id"], v["beam_id"]
                data = np.array(v["data"])
                self.cal_gains[:, b, i] = data[0::2] + 1j * data[1::2]
                self.stats["cal_gains%d" % b][i] = True
            elif v.get("type") == "beamcoeffs":
                b = v["beam_id"]
                delays_ns = np.array(v["data"]["delays"])
                amps = np.array(v["data"]["amps"])
                phases = np.exp(1j * 2 * np.pi * self.freqs[:, None]
                                * delays_ns * 1e-9)
                self.gains_new[:, b, :] = (amps * phases
                                           * self.cal_gains[:, b, :])
                self.gains_load_sample[b] = v.get("load_sample", -1)
                self.update_pending = True
        except (KeyError, IndexError, ValueError, TypeError) as e:
            # a malformed command (bad beam/input id, wrong-length
            # data) must never propagate into the store watch thread —
            # that would kill command processing for EVERY block while
            # the pipeline keeps running
            self.update_stats({"last_cmd_error": str(e)})
            if self.log:
                self.log.error("BEAMFORM >> Failed to parse command: "
                               "%s", e)

    def stage_loads(self, this_gulp_time: int) -> bool:
        """Copy any due per-beam coefficient sets into the active buffer
        (beamform_block.py:416-434).  Returns True if the device copy is
        (now) pending."""
        with self._control_lock:
            for b in range(self.cfg.nbeam):
                ls = self.gains_load_sample[b]
                if ls == -2:
                    continue
                if ls == -1 or this_gulp_time >= ls:
                    self.gains_active[:, b, :] = self.gains_new[:, b, :]
                    self.gains_load_sample[b] = -2
                    self.copy_pending = True
            if (self.gains_load_sample == -2).all():
                self.update_pending = False
        return self.copy_pending

    def device_gains(self) -> bf.BeamGains:
        self.copy_pending = False
        return bf.BeamGains.from_complex(self.gains_active)


class SubselCommandBlock(CommandBlock):
    """Baseline-selection endpoint (corr_subsel_block.py:237-246)."""

    def __init__(self, cfg: XEngineConfig, store=None):
        super().__init__("CorrSubsel", store=store)
        self.cfg = cfg
        default = cs.default_baselines(cfg.nvis_out, cfg.nstand)
        self.define_command_key(
            "baselines", type=list, initial_val=default,
            condition=lambda x: len(x) == cfg.nvis_out)
        self.baselines = default
        self.pairs_device = jnp.asarray(
            cs.baselines_to_inputs(default, cfg.npol).astype(np.int32))
        self._publish_baselines()

    def apply_pending(self) -> bool:
        """Returns True if the selection changed (downstream starts a new
        sequence, corr_subsel_block.py:315-329)."""
        if not self.update_pending:
            return False
        self.update_command_vals()
        self.baselines = self.command_vals["baselines"]
        self.pairs_device = jnp.asarray(cs.baselines_to_inputs(
            self.baselines, self.cfg.npol).astype(np.int32))
        self._publish_baselines()
        return True

    def _publish_baselines(self):
        # the large selection list is exported via stats so the monitor
        # bridge can cache it to a sub-key only-on-change
        # (bifrost_etcd_bridge.py:148-160 semantics)
        self.update_stats({"baselines": self.baselines})


class FEngineCommandBlock(CommandBlock):
    """Channelizer/requant endpoint (FX mode): runtime scalar
    ``quant_scale`` plus per-channel ``eq_gains`` equalization.

    The quantize ops already accept a per-channel scale
    (``ops.pfb.quantize_4bit_planes`` / the fused kernel's scale table);
    this block is the runtime surface for it — the software analog of
    the FPGA F-engine's per-channel EQ coefficients (the reference's
    F-engine is gateware, external to its repo; SURVEY.md section 0).
    Values stage at gulp boundaries like every non-Beamform key
    (block_base.py staging semantics)."""

    def __init__(self, cfg: XEngineConfig, quant_scale: float = 1.0,
                 eq_gains=None, store=None):
        super().__init__("FEngine", store=store)
        self.cfg = cfg
        self.define_command_key(
            "quant_scale", type=(int, float), initial_val=quant_scale,
            condition=lambda x: x > 0)
        self.define_command_key(
            "eq_gains", type=list,
            initial_val=list(eq_gains) if eq_gains is not None else [],
            condition=lambda v: len(v) in (0, cfg.nchan)
            and all(g > 0 for g in v))
        self.scale_device = None
        self._rebuild()

    def _rebuild(self):
        eq = self.command_vals["eq_gains"]
        scale = np.float32(self.command_vals["quant_scale"])
        if eq:
            vec = (np.asarray(eq, np.float32) * scale)
            self.scale_device = jnp.asarray(vec)
        else:
            self.scale_device = jnp.float32(scale)
        self.update_stats({"quant_scale": float(scale),
                           "eq_gains_set": bool(eq)})

    def apply_pending(self) -> bool:
        if not self.update_pending:
            return False
        self.update_command_vals()
        self._rebuild()
        return True


class OutputCommandBlock(CommandBlock):
    """Destination/throttle endpoint for a packet sink
    (command keys per reference: corr_output_full_block.py:412-415).

    ``dest_ip == "0.0.0.0"`` disables emission; changes rebuild the
    sink's sender at the next product (reference semantics: applied on
    the data path at dump boundaries)."""

    def __init__(self, name: str, sink_obj, store=None,
                 dest_port: int = 10001):
        super().__init__(name, store=store)
        self.sink = sink_obj
        self.define_command_key("dest_ip", type=str, initial_val="0.0.0.0")
        self.define_command_key("dest_port", type=int,
                                initial_val=dest_port)
        self.define_command_key("dest_file", type=str, initial_val="")
        self.define_command_key("max_mbps", type=int, initial_val=-1)
        if hasattr(sink_obj, "autos_path"):
            # write_autos: documented in the reference control API but
            # unwired in its block (corr_output_full_control.py:83-87);
            # functional here — "" disables, else a directory path
            self.define_command_key("write_autos", type=str,
                                    initial_val="")
        self._dest_fh = None

    def apply_pending(self):
        if not self.update_pending:
            return
        self.update_command_vals()
        try:
            self._apply_dest()
        except OSError as e:
            # a bad operator destination (unwritable dest_file,
            # unresolvable IP) runs on the OUTPUT thread — it must
            # surface as a stat, not crash the thread and wedge the
            # pipeline behind the full out_queue
            self.update_stats({"last_apply_error": str(e)})
            self.sink.send = None

    def _apply_dest(self):
        if "write_autos" in self.command_vals and \
                hasattr(self.sink, "autos_path"):
            self.sink.autos_path = (self.command_vals["write_autos"]
                                    or None)
        ip = self.command_vals["dest_ip"]
        port = self.command_vals["dest_port"]
        dest_file = self.command_vals["dest_file"]
        from ..io.sink import Throttle, UdpSender

        if self._dest_fh is not None:
            # retarget/disable: release the previous dest_file handle
            # (repeated retargets must not accumulate open fds)
            try:
                self._dest_fh.close()
            except OSError:
                pass
            self._dest_fh = None
        if dest_file:
            fh = open(dest_file, "ab", buffering=0)
            self._dest_fh = fh

            def send(payload, _fh=fh):
                _fh.write(payload)

            self.sink.send = send
        elif ip and ip != "0.0.0.0":
            self.sink.send = UdpSender(ip, port)
        else:
            self.sink.send = None
        mbps = self.command_vals["max_mbps"]
        if hasattr(self.sink, "throttle"):
            # a sink-mandated cap (IBeamOutput.MAX_BPS, the reference's
            # 0.6 Gb/s VLBI ceiling) binds even when the operator asks
            # for more or leaves max_mbps unset; the burst block size
            # the sink chose at construction is preserved
            cap = getattr(self.sink, "MAX_BPS", None)
            rate = mbps * 1e6 if mbps > 0 else None
            if cap is not None:
                rate = cap if rate is None else min(rate, cap)
            bb = getattr(self.sink.throttle, "block_bits", 8_000_000)
            self.sink.throttle = Throttle(rate, block_bits=bb)


class BeamOutputCommandBlock(CommandBlock):
    """Per-beam destination lists for the power-beam streams
    (command keys per reference: beamform_output_block.py — dest_ip and
    dest_port are per-beam lists; '0.0.0.0' disables a beam)."""

    def __init__(self, sink_obj, nbeam2: int, store=None,
                 dest_port: int = 10000):
        super().__init__("BeamformOutput", store=store)
        self.sink = sink_obj
        self.nbeam2 = nbeam2
        self.define_command_key(
            "dest_ip", type=list, initial_val=["0.0.0.0"] * nbeam2,
            condition=lambda x: len(x) <= nbeam2)
        self.define_command_key(
            "dest_port", type=list, initial_val=[dest_port] * nbeam2,
            condition=lambda x: len(x) <= nbeam2)

    def apply_pending(self):
        if not self.update_pending:
            return
        self.update_command_vals()
        from ..io.sink import UdpSender

        ips = self.command_vals["dest_ip"]
        ports = self.command_vals["dest_port"]
        senders = {}
        for b in range(min(len(ips), len(ports), self.nbeam2)):
            if ips[b] and ips[b] != "0.0.0.0":
                senders[b] = UdpSender(ips[b], int(ports[b]))
        self.sink.senders = senders


class TriggeredDumpCommandBlock(CommandBlock):
    """Trigger/abort/stop endpoint for the deep-buffer dump
    (command keys per reference: triggered_dump_block.py:164-169)."""

    def __init__(self, dumper, store=None):
        super().__init__("TriggeredDump", store=store,
                         apply_immediately=True)
        self.dumper = dumper
        self.define_command_key(
            "command", type=str, initial_val="",
            condition=lambda x: x in ("", "trigger", "abort", "stop"))
        self.define_command_key("ntime_per_file", type=int,
                                initial_val=1024)
        self.define_command_key("nfile", type=int, initial_val=1)
        self.define_command_key("dump_path", type=str, initial_val=".")
        self._on_command_applied = self._dispatch
        self.last_files: list = []

    def _dispatch(self, pending: dict):
        cmd = pending.get("command")
        if cmd == "trigger" and self.dumper is not None:
            import threading as _th

            def _run():
                self.update_stats({"state": "dumping"})
                try:
                    self.last_files = self.dumper.trigger(
                        self.command_vals["ntime_per_file"],
                        self.command_vals["nfile"],
                        self.command_vals["dump_path"])
                finally:
                    # never leave the published state stuck at
                    # "dumping" if the dump dies mid-write
                    self.update_stats({"state": "idle",
                                       "last_files": self.last_files})

            _th.Thread(target=_run, daemon=True,
                       name="triggered-dump").start()
        elif cmd in ("abort", "stop") and self.dumper is not None:
            self.dumper.abort()


def source_fill_compatible(src_cls: type) -> bool:
    """Whether the ingest thread may bypass ``stream()`` and have the
    source assemble gulps directly into staging reservations
    (``fill_into`` protocol).

    Engages only when the class that defines the active ``stream()``
    also defines ``fill_into`` — a subclass overriding ``stream()``
    alone (custom timing/jump-injection test sources) keeps its
    generator semantics; a source whose ``stream()`` override is
    fill-equivalent re-declares ``fill_into`` to opt back in
    (io/native.py AdcCaptureSource)."""
    def owner(name):
        for c in src_cls.__mro__:
            if name in vars(c):
                return c
        return None

    fill = owner("fill_into")
    return fill is not None and fill is owner("stream")


class XEnginePipeline:
    """One pipeline instance: threads + fused step + control endpoints."""

    def __init__(self, cfg: XEngineConfig, source, store=None,
                 corr_outputs=(), subsel_outputs=(), pbeam_outputs=(),
                 ibeam_outputs=(), history_nbyte: int = 0,
                 autostartat: int = 0, sync_time: int = 0,
                 selftest: bool = False, batch_accumulations: bool = True,
                 fx_mode: bool = False, quant_scale: float = 1.0,
                 eq_gains=None, mesh=None, dump_direct: bool = False,
                 stub_device_ms: float | None = None):
        self.cfg = cfg
        # stub_device_ms: replace the device call with a sleep of the
        # given milliseconds per fast window (scaled by the call's
        # spectra count) and zero products — isolates the HOST side
        # (capture -> staging -> compute thread -> outputs) for
        # real-time proof where the device link is a tunnel
        # (scripts/bench_pipeline.py --stub-device).
        self.stub_device_ms = stub_device_ms
        # batch_accumulations: process whole fast accumulations in one
        # device call (the MXU accumulates over the full window with no
        # per-gulp HBM round-trips); per-gulp fallback covers partial
        # accumulations after arming/recovery.
        self.batch_accumulations = batch_accumulations
        # selftest: run a (slow!) numpy correlator alongside and compare
        # each fast dump exactly — the reference's Corr(test=True) mode
        # (corr_block.py:265-315, --testcorr flag).
        self.selftest = selftest
        self.selftest_failures = 0
        self.selftest_count = 0
        self._selftest_acc = None
        self.source = source
        self.sync_time = sync_time
        self.corr_outputs = list(corr_outputs)
        self.subsel_outputs = list(subsel_outputs)
        self.pbeam_outputs = list(pbeam_outputs)
        self.ibeam_outputs = list(ibeam_outputs)

        self.fast_ctrl = IntegrationController(
            cfg.ntime_gulp, cfg.acc_len, start_time=autostartat,
            recover_margin=10)
        self.slow_ctrl = IntegrationController(
            cfg.acc_len, cfg.acc_len_slow, start_time=autostartat,
            recover_margin=2, next_boundary_start=False)
        self.corr_cmd = CorrCommandBlock("Corr", self.fast_ctrl,
                                         cfg.ntime_gulp, store=store,
                                         autostartat=autostartat,
                                         acc_len=cfg.acc_len)
        self.corr_acc_cmd = CorrCommandBlock("CorrAcc", self.slow_ctrl,
                                             cfg.acc_len, store=store,
                                             autostartat=autostartat,
                                             acc_len=cfg.acc_len_slow)
        self.beam_cmd = BeamformCommandBlock(cfg, store=store)
        self.subsel_cmd = SubselCommandBlock(cfg, store=store)

        # Backed staging ring (one contiguous buffer, Bifrost's model):
        # sources fill reservations in place and whole accumulation
        # windows read out as ONE contiguous view — no per-gulp
        # ownership copy, no per-window np.concatenate.  Capacity is an
        # EXACT multiple of the fast window so windows never straddle
        # the wrap edge (a straddle falls back to a 325 MB copy at
        # production shape): 3 windows = one held by the compute
        # thread, two of ingest headroom.
        # FX raw gulps hold 2*nchan ADC samples per packed byte slot:
        # 2 * itemsize x the packed size (8x for f32, 2x for int8)
        raw_gulp = cfg.gulp_nbyte * (
            2 * cfg.adc_np_dtype.itemsize if fx_mode else 1)
        self._raw_gulp_nbyte = raw_gulp
        win_gulps = max(1, cfg.acc_len // cfg.ntime_gulp)
        nwin = max(3, -(-(1 << 22) // (win_gulps * raw_gulp)))
        # The backed ring commits (and pre-faults) its whole capacity up
        # front; f32-ADC FX at production shape would commit ~7.8 GB
        # before any data flows.  Past a budget (default 3 GB,
        # CBD_STAGING_MAX_BYTES to override) fall back to on-demand heap
        # spans — correctness is identical, windows just pay the
        # assemble-time concatenate instead of the zero-copy view.
        total = nwin * win_gulps * raw_gulp
        backing_max = int(os.environ.get("CBD_STAGING_MAX_BYTES",
                                         3 << 30))
        self.staging = Ring("staging", nbyte_budget=total,
                            backing=total <= backing_max)
        self.history = None
        self.dump_cmd = None
        if history_nbyte:
            # FX mode buffers raw ADC frames (2 * itemsize x packed size)
            frame_nbyte = (cfg.ntime_gulp * 2 * cfg.nchan * cfg.ninput
                           * cfg.adc_np_dtype.itemsize
                           if fx_mode else cfg.gulp_nbyte)
            self.history = HistoryRing(history_nbyte,
                                       frame_nbyte=frame_nbyte)
            from ..io.sink import TriggeredDump

            self.dumper = TriggeredDump(self.history,
                                        direct=dump_direct)
            self.dump_cmd = TriggeredDumpCommandBlock(self.dumper,
                                                      store=store)
        # runtime destination control for the primary sinks
        self.output_cmds = []
        for name, sinks in (("CorrOutputFull", self.corr_outputs),
                            ("CorrOutputPart", self.subsel_outputs),
                            ("BeamformVlbiOutput", self.ibeam_outputs)):
            for s in sinks:
                self.output_cmds.append(OutputCommandBlock(name, s,
                                                           store=store))
        for s in self.pbeam_outputs:
            self.output_cmds.append(BeamOutputCommandBlock(
                s, cfg.nbeam // 2, store=store))
        self.out_queue: queue.Queue = queue.Queue(maxsize=8)
        # beam products are computed (and fetched) only when a sink for
        # them exists — an unconfigured product costs neither MXU time
        # nor PCIe/tunnel bandwidth (sinks are fixed at construction;
        # runtime commands only retarget destinations)
        self._want_power = bool(self.pbeam_outputs)
        self._want_vlbi = bool(self.ibeam_outputs)
        # likewise the baseline-selection gather: skipped when no
        # subsel sink exists (and, with static boundary flags, on
        # mid-window gulps in per-gulp mode — subsel consumes fast
        # dumps, corr_subsel_block.py:298)
        self._want_subsel = bool(self.subsel_outputs)
        # FX mode: source delivers raw f32 ADC samples; the device step
        # prepends the PFB channelizer + 4-bit requant.  The (ntap-1)
        # boundary frames are carried between blocks on the host (the
        # single-device analog of the mesh halo exchange).
        self.fx_mode = fx_mode
        self.quant_scale = quant_scale
        self.feng_cmd = None
        if fx_mode:
            self.feng_cmd = FEngineCommandBlock(cfg, quant_scale,
                                                eq_gains, store=store)
        if fx_mode and selftest:
            raise ValueError("selftest compares packed post-F input; "
                             "not applicable in FX mode")
        if fx_mode:
            from ..ops import pfb as pfb_ops

            self._window = jnp.asarray(
                pfb_ops.pfb_window(cfg.nchan, cfg.pfb_ntap))
            self._adc_tail = np.zeros(
                ((cfg.pfb_ntap - 1) * 2 * cfg.nchan, cfg.ninput),
                cfg.adc_np_dtype)
        # optional multi-chip execution: the fused step runs shard_map'd
        # over a ('time','chan') mesh with chan-sharded accumulators
        # (parallel/mesh.xengine_sharded_state_fn); flag-specialized jits
        # are built lazily per boundary combination.
        self.mesh = mesh
        self._mesh_steps: dict = {}
        if mesh is not None:
            # fast accumulator = per-time-shard partials (mesh.py
            # zero_sharded_state); the full matrix appears only in dump
            # outputs, after the once-per-window psum
            from ..parallel import mesh as pmesh

            self.state = xengine.XEngineState(
                *pmesh.zero_sharded_state(cfg, mesh))
            self._last_mesh_vis = None
        else:
            self.state = xengine.init_state(cfg)
        self._stop = threading.Event()
        self.perf_compute = PerfTimer(self.corr_cmd.perf_proclog)
        self.ndump_fast = 0
        self.ndump_slow = 0

    # -- threads --------------------------------------------------------------

    def _ingest(self, ngulp: int):
        """Source -> staging ring.  A timestamp discontinuity from the
        source (capture after packet loss / resync) starts a NEW
        sequence, exactly as the reference's C capture engine does
        (capture_block.py seq_callback; SURVEY.md section 5 recovery
        invariant) — the compute thread then re-arms via
        ``on_sequence_start``."""
        seq = None
        expected = None
        time_tag = 0
        for t, gulp, owned in self._gulp_iter(ngulp):
            if self._stop.is_set():
                break
            if seq is None or t != expected:
                if seq is not None:
                    self.staging.end_sequence(seq)
                time_tag += 1
                seq = self.staging.begin_sequence(
                    time_tag=time_tag,
                    header=self.source.header(seq0=t,
                                              sync_time=self.sync_time))
                if self.history is not None:
                    # keep frame-index -> sequence mapping consistent
                    # for frames already resident: frame `count` maps
                    # to t.  Sequence numbers advance ntime_gulp per
                    # gulp in BOTH modes (AdcCaptureSource keeps ADC
                    # seqs in output-spectra units), so the per-frame
                    # seq step is ntime_gulp — NOT the per-frame ADC
                    # sample count
                    self.history.set_header(
                        seq.header,
                        t - self.history.count * self.cfg.ntime_gulp)
            if owned:
                self.staging.commit_span(seq, gulp)
            else:
                self.staging.write_span(seq, gulp)
            if self.history is not None:
                self.history.push(gulp)
            expected = t + self.cfg.ntime_gulp
        if seq is not None:
            self.staging.end_sequence(seq)
        self.staging.shutdown()

    def _gulp_iter(self, ngulp: int):
        """Yield (t, gulp, ring_owned).  Zero-copy path: reserve staging
        memory and have the source fill it in place (fill_into
        protocol); sources without it fall back to stream() + the
        ring's ownership copy."""
        cfg = self.cfg
        use_fill = self.staging.backed and source_fill_compatible(
            type(self.source))
        if not use_fill:
            for t, gulp in self.source.stream(ngulp):
                yield t, gulp, False
            return
        n = 0
        while ngulp == 0 or n < ngulp:
            if self._stop.is_set():
                return
            dest = self.staging.reserve_span(self._raw_gulp_nbyte,
                                             timeout=2.0)
            if dest is None:
                continue  # backpressure/shutdown poll; _stop re-checked
            t = self.source.fill_into(dest)
            if t is None:  # capture poll timeout / source stopped
                self.staging.release_span(dest)
                if getattr(self.source, "_stopped", False):
                    return
                continue
            if self.fx_mode:
                gulp = dest.view(cfg.adc_np_dtype).reshape(-1, cfg.ninput)
            else:
                gulp = dest.reshape(cfg.ntime_gulp, cfg.nchan,
                                    cfg.ninput)
            yield t, gulp, True
            n += 1

    def _assemble(self, spans):
        """One [nspec, nchan, ninput] block over ``spans`` with the
        minimum copying the device path allows; returns (block,
        spans_to_release_after_the_step).

        Consecutive staging reservations are byte-adjacent, so a whole
        window is usually ONE contiguous ring view — zero-copy.  But
        ``jnp.asarray`` ALIASES host uint8 memory on the CPU backend
        and dispatch is async, so ring memory handed to a real device
        must be copied out first (then the ring slots free
        immediately); the stub-device path (bench_pipeline
        --stub-device) and heap spans need no copy."""
        cfg = self.cfg
        flat = self.staging.contiguous_view(spans)
        if flat is not None:
            blk = flat.view(spans[0].dtype)
        elif len(spans) == 1:
            blk = spans[0]
        else:
            blk = np.concatenate([s.reshape(-1) for s in spans])
        blk = blk.reshape(-1, cfg.nchan, cfg.ninput)
        if flat is None and len(spans) > 1:
            # already a private copy; ring slots (if any) free now
            self._release_spans(spans)
            return blk, []
        if self.staging._span_off(blk) is None:
            return blk, []          # heap span: private already
        if self.stub_device_ms is not None:
            return blk, spans       # stub never aliases past the call
        blk = blk.copy()
        self._release_spans(spans)
        return blk, []

    def _release_spans(self, spans) -> None:
        for s in spans:
            self.staging.release_span(s)

    def _run_step(self, block, gains_dev, is_first, is_dump, slow_first):
        """One device call over ``block``: packed
        [k*ntime_gulp, nchan, ninput] uint8, or in FX mode raw ADC
        [k*ntime_gulp*2*nchan, ninput] f32."""
        cfg = self.cfg
        if self.stub_device_ms is not None:
            import time as _time

            nspec = (block.size // (cfg.nchan * cfg.ninput)
                     if not self.fx_mode
                     else block.size // (2 * cfg.nchan * cfg.ninput))
            _time.sleep(self.stub_device_ms * 1e-3 * nspec / cfg.acc_len)
            subsel = correlate.Vis(
                np.zeros((cfg.nchan // cfg.nchan_sum, cfg.nvis_out),
                         np.int32),
                np.zeros((cfg.nchan // cfg.nchan_sum, cfg.nvis_out),
                         np.int32)) if is_dump else None
            return xengine.XEngineOutputs(subsel, None, None)
        if self.mesh is not None:
            import jax as _jax

            from ..parallel import mesh as pmesh

            key = (bool(is_first), bool(is_dump), bool(slow_first))
            st = (self.state.vis_fast, self.state.vis_slow)
            if self.fx_mode:
                # sharded FX: on-mesh ppermute halo between time shards;
                # the host carries only the block-boundary ADC tail
                if key not in self._mesh_steps:
                    self._mesh_steps[key] = _jax.jit(
                        pmesh.fx_sharded_state_fn(
                            cfg, self.mesh, *key,
                            want_power=self._want_power,
                            want_vlbi=self._want_vlbi,
                            want_subsel=self._want_subsel))
                adc = block.reshape(-1, cfg.ninput)
                tail_prev = self._adc_tail
                self._adc_tail = self._next_tail(adc)
                with _jax.set_mesh(self.mesh):
                    st, out, vlbi = self._mesh_steps[key](
                        st, jnp.asarray(adc), jnp.asarray(tail_prev),
                        self._window, self.feng_cmd.scale_device,
                        gains_dev, self.subsel_cmd.pairs_device)
                    self.state = xengine.XEngineState(st[0], st[1])
                if out.vis is not None:
                    self._last_mesh_vis = out.vis
                return xengine.XEngineOutputs(out.subsel, out.bf_power,
                                              vlbi)
            if key not in self._mesh_steps:
                self._mesh_steps[key] = _jax.jit(
                    pmesh.xengine_sharded_state_fn(
                        cfg, self.mesh, *key,
                        want_power=self._want_power,
                        want_vlbi=self._want_vlbi,
                        want_subsel=self._want_subsel))
            with _jax.set_mesh(self.mesh):
                st, out, vlbi = self._mesh_steps[key](
                    st, jnp.asarray(block), gains_dev,
                    self.subsel_cmd.pairs_device)
                self.state = xengine.XEngineState(st[0], st[1])
            if out.vis is not None:
                self._last_mesh_vis = out.vis
            return xengine.XEngineOutputs(out.subsel, out.bf_power, vlbi)
        if self.fx_mode:
            adc = block.reshape(-1, cfg.ninput)
            adc_ext = np.concatenate([self._adc_tail, adc])
            self._adc_tail = self._next_tail(adc)
            self.state, out = xengine.fx_step_jit(
                self.state, jnp.asarray(adc_ext), self._window,
                self.feng_cmd.scale_device, gains_dev,
                self.subsel_cmd.pairs_device, bool(is_first),
                bool(is_dump), bool(slow_first), cfg, self._want_power,
                self._want_vlbi, self._want_subsel)
            return out
        packed = jnp.asarray(block)
        self.state, out = xengine.xengine_step_jit(
            self.state, packed, gains_dev, self.subsel_cmd.pairs_device,
            bool(is_first), bool(is_dump), bool(slow_first), cfg,
            self._want_power, self._want_vlbi, self._want_subsel)
        return out

    def _emit(self, out, t, hdr, dec, slow_dec):
        """Queue device-resident products for the output thread.

        The D2H fetches happen in the OUTPUT thread, so the compute
        thread never blocks on the device: while step N's products
        transfer and packetize, the compute thread is already staging
        and dispatching step N+1 (the H2D upload overlaps N's device
        execution — the double-buffering the reference builds from
        rings + cudaMemcpyAsync, VERDICT r1 weak 2)."""
        products = {"seq0": t, "hdr": hdr}
        if out.bf_power is not None:
            products["bf_power"] = out.bf_power
        if out.vlbi is not None:
            products["vlbi"] = out.vlbi
        if dec.action == Action.DUMP:
            if out.subsel is not None:
                products["subsel"] = out.subsel
                products["subsel_baselines"] = self.subsel_cmd.baselines
            products["fast_seq0"] = dec.seq0
            products["acc_len"] = dec.acc_len
            self.ndump_fast += 1
            if slow_dec.action == Action.DUMP:
                # device-side mirror (pallas engines); int32 planes.
                # The complex128 view is built lazily in the output
                # thread only when a consumer needs it.
                products["vis_slow_planes"] = xengine.dense_vis(
                    self.state.vis_slow, self.cfg)
                products["slow_seq0"] = slow_dec.seq0
                products["slow_acc_len"] = slow_dec.acc_len
                self.ndump_slow += 1
        self.out_queue.put(products)

    def _sync_slow_granularity(self):
        """A runtime fast acc_len change alters the slow accumulator's
        input grid (the reference reads upstream_acc_len from each new
        Corr output sequence and realigns, corr_acc_block.py:215-235).
        Without this, the slow controller's exact-match boundaries sit
        off the new dump grid and slow dumps silently stop forever."""
        new_g = self.fast_ctrl.acc_len
        slow = self.slow_ctrl
        if slow.acc_len % new_g:
            # incompatible — the reference logs the same condition as an
            # error (corr_acc_block.py:231-233)
            self.corr_acc_cmd.update_stats(
                {"upstream_acc_error":
                 f"acc_len {slow.acc_len} incompatible with upstream "
                 f"{new_g}"})
        slow.granularity = new_g
        base = self.fast_ctrl.start_time
        if slow.started:
            # realign like a new upstream sequence, measured from the
            # fast controller's (new) start
            slow.on_sequence_start(base)
            return
        # not started: the armed (possibly still-pending) start must
        # land on the NEW fast dump grid (base + k*new_g) and not
        # before the fast restart, else its exact-match boundary never
        # arrives.  Restage directly — reachability is guaranteed by
        # construction, and command() would re-validate against a
        # granularity the operator never chose.
        st, al = (slow._pending if slow.update_pending
                  else (slow.start_time, slow.acc_len))
        if st is None or st == -1 or not al:
            return
        st2 = st
        if st2 < base:
            st2 = st + -(-(base - st) // al) * al  # ceil to its grid
        off = (st2 - base) % new_g
        if off:
            st2 += new_g - off
        if st2 != st:
            slow._pending = (st2, al)
            slow.update_pending = True

    def _next_tail(self, adc: np.ndarray) -> np.ndarray:
        """Carry the last (ntap-1) frames of this block as the next
        block's PFB overlap.  With ntap == 1 there IS no overlap and
        the carry must stay empty — ``adc[-0:]`` would alias the WHOLE
        block and double every subsequent step's sample count."""
        k = self._adc_tail.shape[0]
        return adc[len(adc) - k:].copy() if k else self._adc_tail

    def _selftest_update(self, span, is_first, is_dump):
        from ..verification import golden as _golden

        cfg = self.cfg
        ref = _golden.reference_correlation(span.reshape(
            -1, cfg.nchan, cfg.nstand, cfg.npol))
        self._selftest_acc = (ref if is_first
                              else self._selftest_acc + ref)
        if is_dump:
            if self.mesh is not None:
                # mesh path: the full matrix only exists in the dump
                # output (fast state holds per-time-shard partials)
                fast = self._last_mesh_vis
            else:
                fast = xengine.dense_vis(self.state.vis_fast, self.cfg)
            got = correlate.vis_to_numpy_complex(fast)
            ok = _golden.check_vis_against_golden(got, self._selftest_acc)
            self.selftest_count += 1
            if not ok:
                self.selftest_failures += 1
            self.corr_cmd.update_stats({"selftest_ok": bool(ok)})

    def _device_gains(self):
        """Gains operand for the fused step.  With the fused Pallas
        beamformer (non-mesh), prestack the bf16 hi/lo operand ONCE per
        gain load instead of re-deriving it inside every jitted call."""
        gains = self.beam_cmd.device_gains()
        if self.cfg.bf_engine == "pallas" and self.mesh is None:
            from ..models.xengine import bf_operand_ni
            from ..ops.pallas.beamform_fused import stacked_gains

            return stacked_gains(gains, bf_operand_ni(self.cfg))
        return gains

    def _compute(self):
        # the sentinel must reach the output thread on EVERY exit path
        # (normal end, stop-requested early return, exception) or it
        # blocks in out_queue.get() forever
        try:
            self._compute_loop()
        finally:
            self.out_queue.put(None)

    def _compute_loop(self):
        cfg = self.cfg
        gains_dev = self._device_gains()
        gulps_per_acc = self.fast_ctrl.acc_len // cfg.ntime_gulp
        for seq in self.staging.read():
            hdr = seq.header
            t = hdr["seq0"]
            self.corr_cmd.sequence_proclog.update(hdr)
            self.corr_acc_cmd.sequence_proclog.update(hdr)
            if self.fx_mode:
                # a new sequence means the ingest saw a stream break:
                # the PFB FIR must not convolve across the gap, so the
                # sequence restarts with a zero tail (stream-start
                # semantics: its first ntap-1 spectra see zeros,
                # exactly as at t=0) instead of prepending stale
                # pre-gap samples
                self._adc_tail = np.zeros_like(self._adc_tail)
            self.fast_ctrl.on_sequence_start(t)
            # The slow accumulator consumes the FAST output stream, so
            # its realign measures missed integrations from the fast
            # controller's RECOVERED start (the new output sequence
            # head — reference: corr_acc_block.py:215-235, where
            # this_gulp_time is the first fast dump of the new
            # sequence), not the raw capture head.  With the raw head,
            # the slow restart (margin 2) lands BEFORE the fast restart
            # (margin 10) and its exact-match boundary never arrives —
            # slow dumps would stop forever after a resync.
            self.slow_ctrl.on_sequence_start(
                max(t, self.fast_ctrl.start_time))
            slow_dec = None
            batch: list = []  # buffered (t, span, dec) within one acc
            for span in self.staging.read_spans(seq):
                self.perf_compute.mark_acquire()
                if self._stop.is_set():
                    return
                if not batch:
                    # commands and coefficient loads apply at accumulation
                    # boundaries (gulp boundaries in unbatched mode)
                    self.corr_cmd.apply_pending()
                    self.corr_acc_cmd.apply_pending()
                    self.subsel_cmd.apply_pending()
                    if self.feng_cmd is not None:
                        self.feng_cmd.apply_pending()
                    if self.beam_cmd.stage_loads(t):
                        gains_dev = self._device_gains()
                    gulps_per_acc = max(
                        1, self.fast_ctrl.acc_len // cfg.ntime_gulp)
                dec = self.fast_ctrl.on_gulp(t)
                if self.fast_ctrl.acc_len and \
                        self.fast_ctrl.acc_len != self.slow_ctrl.granularity:
                    self._sync_slow_granularity()
                self.corr_cmd.update_stats(
                    {"state": self.fast_ctrl.state, "curr_sample": t})
                if dec.action == Action.SKIP:
                    self.staging.release_span(span)
                    t += cfg.ntime_gulp
                    self.perf_compute.tick()
                    continue
                if dec.is_first:
                    slow_dec = self.slow_ctrl.on_gulp(dec.seq0)
                    self.corr_acc_cmd.update_stats(
                        {"state": self.slow_ctrl.state})
                self.perf_compute.mark_reserve()
                # a runtime acc_len larger than the staging ring can
                # hold must not buffer a whole window (writer deadlock)
                fits = (gulps_per_acc + 2) * self._raw_gulp_nbyte \
                    <= self.staging.nbyte_budget
                if self.batch_accumulations and gulps_per_acc > 1 \
                        and fits:
                    batch.append((t, span, dec))
                    if dec.action == Action.DUMP:
                        if len(batch) == gulps_per_acc:
                            # whole accumulation in ONE device call: the
                            # MXU accumulates over k*ntime_gulp samples
                            # with no intermediate HBM round-trips
                            block, hold = self._assemble(
                                [s for _, s, _ in batch])
                            out = self._run_step(block, gains_dev, True,
                                                 True, slow_dec.is_first)
                            if self.selftest:
                                self._selftest_update(block, True, True)
                            self._emit(out, batch[0][0], hdr, dec,
                                       slow_dec)
                            self._release_spans(hold)
                        else:
                            # partial accumulation (start mid-way after
                            # arming/recovery): per-gulp fallback
                            for tg, sg, dg in batch:
                                blk, hold = self._assemble([sg])
                                out = self._run_step(
                                    blk, gains_dev, dg.is_first,
                                    dg.action == Action.DUMP,
                                    slow_dec.is_first)
                                if self.selftest:
                                    self._selftest_update(
                                        blk, dg.is_first,
                                        dg.action == Action.DUMP)
                                self._emit(out, tg, hdr, dg, slow_dec)
                                self._release_spans(hold)
                        batch = []
                        self.perf_compute.mark_process(
                            gulps_per_acc * span.nbytes)
                        self.perf_compute.publish()
                        self.corr_cmd.update_stats(
                            {"last_end_sample": t})
                else:
                    blk, hold = self._assemble([span])
                    out = self._run_step(
                        blk, gains_dev, dec.is_first,
                        dec.action == Action.DUMP, slow_dec.is_first)
                    if self.selftest:
                        self._selftest_update(blk, dec.is_first,
                                              dec.action == Action.DUMP)
                    self._emit(out, t, hdr, dec, slow_dec)
                    self._release_spans(hold)
                    self.perf_compute.mark_process(span.nbytes)
                    self.perf_compute.publish()
                    if dec.action == Action.DUMP:
                        self.corr_cmd.update_stats(
                            {"last_end_sample": t})
                t += cfg.ntime_gulp
            # sequence ended mid-window: hand leftover ring memory back
            self._release_spans([s for _, s, _ in batch])

    def _output(self):
        cfg = self.cfg
        while True:
            item = self.out_queue.get()
            if item is None:
                return
            # D2H happens here, off the compute thread's critical path
            if "bf_power" in item:
                item["bf_power"] = np.asarray(item["bf_power"])
            if "vlbi" in item:
                item["vlbi"] = np.asarray(item["vlbi"])
            if "subsel" in item:
                sub = item["subsel"]
                item["subsel"] = (np.asarray(sub.real),
                                  np.asarray(sub.imag))
            if "vis_slow_planes" in item:
                planes = item["vis_slow_planes"]
                item["vis_slow_planes"] = (np.asarray(planes.real),
                                           np.asarray(planes.imag))
            for oc in self.output_cmds:
                oc.apply_pending()
            if "bf_power" in item:
                for snk in self.pbeam_outputs:
                    snk.send_powers(item["bf_power"], item["seq0"],
                                    cfg.ntime_sum)
            if "vlbi" in item:
                for snk in self.ibeam_outputs:
                    snk.send_voltages(item["vlbi"], item["seq0"])
            if "subsel" in item:
                for snk in self.subsel_outputs:
                    snk.send_subsel(item["subsel"][0], item["subsel"][1],
                                    np.asarray(item["subsel_baselines"],
                                               np.uint32),
                                    self.sync_time, item["fast_seq0"],
                                    item["acc_len"])
            if "vis_slow_planes" in item:
                vr, vi = item["vis_slow_planes"]
                dense = None
                for snk in self.corr_outputs:
                    if snk.checkfile:
                        if dense is None:
                            dense = (vr.astype(np.int64)
                                     + 1j * vi.astype(np.int64)
                                     ).astype(np.complex128)
                        snk.check_against_file(
                            dense, item["slow_acc_len"],
                            item["slow_seq0"] // item["slow_acc_len"])
                    if getattr(snk, "native_dest", None) is not None:
                        snk.send_matrix_planes(vr, vi, self.sync_time,
                                               item["slow_seq0"],
                                               item["slow_acc_len"])
                    else:
                        if dense is None:
                            dense = (vr.astype(np.int64)
                                     + 1j * vi.astype(np.int64)
                                     ).astype(np.complex128)
                        snk.send_matrix(dense, self.sync_time,
                                        item["slow_seq0"],
                                        item["slow_acc_len"])

    # -- lifecycle ------------------------------------------------------------

    def run(self, ngulp: int, timeout_s: float | None = None):
        """Run all three stages to completion for ``ngulp`` gulps."""
        threads = [
            threading.Thread(target=self._ingest, args=(ngulp,),
                             name="ingest", daemon=True),
            threading.Thread(target=self._compute, name="compute",
                             daemon=True),
            threading.Thread(target=self._output, name="output",
                             daemon=True),
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=timeout_s)
            if th.is_alive():
                # full shutdown, not just the stop flag: an ingest
                # blocked in write_span (ring backpressure) or a source
                # blocked in recv only observes staging.shutdown() /
                # source.stop() — otherwise zombie threads keep the
                # ring and socket resources alive
                self.shutdown()
                raise TimeoutError(f"pipeline stage {th.name} stalled")

    def shutdown(self):
        self._stop.set()
        if hasattr(self.source, "stop"):
            self.source.stop()
        self.staging.shutdown()


def build_pipeline_from_json(cfg_json: str, **kw) -> XEnginePipeline:
    """Construct a pipeline from a JSON config blob (CLI entry support)."""
    d = json.loads(cfg_json)
    cfg = XEngineConfig(**d.get("config", {}))
    from ..io.source import DummySource

    src = DummySource(cfg, **d.get("source", {}))
    return XEnginePipeline(cfg, src, **kw)
