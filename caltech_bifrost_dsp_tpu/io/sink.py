"""Product sinks: correlation/beam packet emitters, disk writers and the
triggered voltage dump.

Parity targets:
- CorrOutputFull: one dual-pol baseline per packet over the upper triangle,
  Mbps throttling every ~1 MB, optional golden-file equality check
  (reference: blocks/corr_output_full_block.py:439-603).  Two wire formats,
  selected by ``use_cor_fmt`` exactly as in the reference (:655-664): the
  custom 56-byte struct, or the production LWA-SV "COR" Mark5C format
  (32-byte header, chan-major payload, 1-indexed stands).  With
  ``dest_file`` both formats stream the same packets to a file — the
  bifrost ``DiskWriter('cor_<nchan>')`` mode.
- CorrOutputPart: custom format sends bursts of ``nvis_per_packet``
  subselected visibilities with the baseline map in each header; COR format
  sends one dual-pol baseline per packet with stands taken from the
  upper-triangle enumeration of the effective stand count, as bifrost's
  packetizer does (reference: blocks/corr_output_part_block.py:366-401).
- BeamformOutput: per-beam PBEAM streams with per-beam destinations
  (reference: blocks/beamform_output_block.py:248-300).
- BeamformVlbiOutput: IBEAM voltage packets, burst-throttled to 0.6 Gb/s
  (reference: blocks/beamform_vlbi_output_block.py:202-275).
- TriggeredDump: deep-history ring -> self-describing dump files
  (reference: blocks/triggered_dump_block.py:131-298).

A destination of ``"0.0.0.0"`` disables emission, as in the reference.
Writers take a ``send`` callable (socket.sendto by default) so tests can
capture packets without a network.
"""

from __future__ import annotations

import json
import os
import socket
import time

import numpy as np

from ..utils.proclog import PerfTimer
from . import packets as pk


class Throttle:
    """Token-style rate cap: sleep after every ~1 MB block when over rate
    (corr_output_full_block.py:462-473)."""

    def __init__(self, max_bps: float | None, block_bits: int = 8_000_000):
        self.max_bps = max_bps
        self.block_bits = block_bits
        self._bits = 0
        self._t0 = time.monotonic()

    def account(self, nbits: int) -> None:
        if not self.max_bps or self.max_bps <= 0:
            return
        self._bits += nbits
        if self._bits >= self.block_bits:
            elapsed = time.monotonic() - self._t0
            min_time = self._bits / self.max_bps
            if min_time > elapsed:
                time.sleep(min_time - elapsed)
            self._t0 = time.monotonic()
            self._bits = 0


class UdpSender:
    def __init__(self, dest_ip: str, dest_port: int):
        self.dest = (dest_ip, dest_port)
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    def __call__(self, payload: bytes) -> None:
        self.sock.sendto(payload, self.dest)


def udp_rx_socket(ip: str, port: int, rcvbuf_mb: int = 64,
                  timeout_s: float | None = None):
    """Bound receive socket with a deep kernel buffer — the shared
    setup of every product-stream receiver CLI."""
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                    rcvbuf_mb * 1024 * 1024)
    sock.bind((ip, port))
    if timeout_s is not None:
        sock.settimeout(timeout_s)
    return sock


def _cor_header_fields(cfg, sync_time: int, spectra_id: int,
                       acc_len: int, nchan_sum: int = 1):
    """Shared Mark5C header arithmetic (ADC-sample time units,
    corr_output_full_block.py:624,676-677): returns (frame_number,
    secs_count, freq_count, time_tag, navg)."""
    sps = int(round(cfg.fs_hz / cfg.chan_bw_hz))
    return (pk.cor_frame_number(nchan_sum, cfg.npipeline,
                                cfg.pipeline_id + 1),
            int(sync_time + spectra_id / cfg.spectra_rate_hz)
            & 0xFFFFFFFF,
            cfg.chan0 & 0xFFFF, spectra_id * sps, acc_len * sps)


class CorrFullOutput:
    """Emit a slow-dump visibility matrix as full-correlation packets."""

    def __init__(self, cfg, send=None, max_mbps: int = -1,
                 checkfile: str | None = None, checkfile_acc_len: int = 0,
                 native_dest: tuple[str, int] | None = None,
                 use_cor_fmt: bool = False):
        self.cfg = cfg
        self.send = send
        self.max_mbps = max_mbps
        self.native_dest = native_dest  # (ip, port): use the C++
        # packetizer (byte-identical packets, ~50x rate)
        self.use_cor_fmt = use_cor_fmt
        # write_autos: per-dump autocorrelation spectra to .npy files
        # (the reference DOCUMENTS this control key but never wired it —
        # corr_output_full_control.py:83-87 vs corr_output_full_block.py;
        # here it works)
        self.autos_path: str | None = None
        self.throttle = Throttle(max_mbps * 1e6 if max_mbps > 0 else None)
        self.perf = PerfTimer()
        self.checkfile = checkfile
        self.checkfile_acc_len = checkfile_acc_len
        self._checkdata = None
        self.check_failures = 0
        self.check_count = 0

    def send_matrix_planes(self, vis_re, vis_im, sync_time: int,
                           spectra_id: int, acc_len: int) -> int:
        """Native-path emission from int32 planes (no complex128
        materialization)."""
        from . import native

        cfg = self.cfg
        if self.native_dest is None or not native.available():
            import numpy as np

            dense = (np.asarray(vis_re, dtype=np.int64)
                     + 1j * np.asarray(vis_im, dtype=np.int64)
                     ).astype(np.complex128)
            return self.send_matrix(dense, sync_time, spectra_id, acc_len)
        if self.autos_path:
            # autocorrelations are real: the re plane's diagonal suffices
            self._write_autos_planes(np.asarray(vis_re), spectra_id)
        ip, port = self.native_dest
        self.perf.tick()
        if self.use_cor_fmt:
            fn, secs, freq, time_tag, navg = _cor_header_fields(
                cfg, sync_time, spectra_id, acc_len)
            n = native.cor5c_send_matrix(
                vis_re, vis_im, cfg.nstand, cfg.npol, fn, secs, freq,
                time_tag, navg,
                dest_ip=ip, port=port, max_mbps=float(self.max_mbps))
        else:
            n = native.cor_send_matrix(
                vis_re, vis_im, cfg.nstand, cfg.npol, sync_time,
                spectra_id, cfg.nchan * cfg.chan_bw_hz, cfg.sfreq_hz,
                acc_len, cfg.chan0, dest_ip=ip, port=port,
                max_mbps=float(self.max_mbps))
        hdr_nbyte = 32 if self.use_cor_fmt else 56
        self.perf.mark_process(n * (hdr_nbyte + cfg.npol * cfg.npol
                                    * cfg.nchan * 8))
        return n

    def _load_checkfile_corr(self, t_index: int) -> np.ndarray:
        """One golden integration, looping the file
        (corr_output_full_block.py:get_checkfile_corr)."""
        cfg = self.cfg
        dim = (cfg.nchan, cfg.nstand, cfg.nstand, cfg.npol, cfg.npol)
        nbyte = int(np.prod(dim)) * 16
        fsize = os.path.getsize(self.checkfile)
        with open(self.checkfile, "rb") as fh:
            # skip the one-line JSON header if present
            first = fh.readline()
            base = len(first) if first.startswith(b"{") else 0
            payload = fsize - base
            fh.seek(base + (nbyte * t_index) % payload)
            raw = fh.read(nbyte)
        return np.frombuffer(raw, np.complex128).reshape(dim)

    def check_against_file(self, vis_dense: np.ndarray, acc_len: int,
                           t_index: int) -> bool:
        """Integrate the golden file up to ``acc_len`` and compare exactly
        (corr_output_full_block.py:550-603 / test_corr_full_rx.py:43-56
        repetition arithmetic)."""
        assert acc_len % self.checkfile_acc_len == 0
        nrep = acc_len // self.checkfile_acc_len
        t0 = t_index * nrep
        want = sum(self._load_checkfile_corr(t0 + i) for i in range(nrep))
        cfg = self.cfg
        g = want.transpose(0, 1, 3, 2, 4).reshape(cfg.nchan, cfg.ninput,
                                                  cfg.ninput)
        ok = bool(np.array_equal(vis_dense, g))
        self.check_count += 1
        if not ok:
            self.check_failures += 1
        return ok

    def write_autos(self, vis_dense: np.ndarray, spectra_id: int) -> str:
        """Dump per-stand autocorrelation spectra
        (real f32 [nstand, npol, nchan]) to <autos_path>/autos_<id>.npy."""
        return self._write_autos_planes(np.real(vis_dense), spectra_id)

    def _write_autos_planes(self, vis_re: np.ndarray,
                            spectra_id: int) -> str:
        from ..ops.correlate import autocorr_spectra

        cfg = self.cfg
        autos = autocorr_spectra(vis_re, cfg.nstand, cfg.npol)
        fname = os.path.join(self.autos_path,
                             "autos_%d.npy" % spectra_id)
        np.save(fname, autos)
        return fname

    def send_matrix(self, vis_dense: np.ndarray, sync_time: int,
                    spectra_id: int, acc_len: int) -> int:
        """Packetize the upper triangle, one dual-pol baseline per packet.
        Returns packets sent."""
        if self.autos_path:
            self.write_autos(vis_dense, spectra_id)
        if self.send is None:
            return 0
        cfg = self.cfg
        self.perf.tick()
        v = vis_dense.reshape(cfg.nchan, cfg.nstand, cfg.npol, cfg.nstand,
                              cfg.npol)
        frame_number, secs, freq, time_tag, navg = _cor_header_fields(
            cfg, sync_time, spectra_id, acc_len)
        npkt = 0
        for s0 in range(cfg.nstand):
            block = v[:, s0, :, s0:, :]  # [chan, p0, nstand-s0, p1]
            for j in range(block.shape[2]):
                z = block[:, :, j, :]           # [chan, p0, p1]
                if self.use_cor_fmt:
                    data = np.empty((cfg.nchan, cfg.npol, cfg.npol, 2),
                                    np.int32)
                    data[..., 0] = z.real
                    data[..., 1] = z.imag
                    hdr5c = pk.CorHeader(
                        frame_number=frame_number, secs_count=secs,
                        freq_count=freq, cor_gain=0,
                        time_tag=time_tag, cor_navg=navg,
                        stand_i=s0 + 1, stand_j=s0 + j + 1)
                    pkt = pk.encode_cor(hdr5c, data)
                else:
                    data = np.empty((cfg.npol, cfg.npol, cfg.nchan, 2),
                                    np.int32)
                    zz = np.transpose(z, (1, 2, 0))  # [p0, p1, chan]
                    data[..., 0] = zz.real
                    data[..., 1] = zz.imag
                    hdr = pk.CorrFullHeader(
                        sync_time=sync_time, spectra_id=spectra_id,
                        bw_hz=cfg.nchan * cfg.chan_bw_hz,
                        sfreq_hz=cfg.sfreq_hz, acc_len=acc_len,
                        nchans=cfg.nchan, chan0=cfg.chan0, npols=cfg.npol,
                        stand0=s0, stand1=s0 + j)
                    pkt = pk.encode_corr_full(hdr, data)
                self.send(pkt)
                self.throttle.account(8 * len(pkt))
                npkt += 1
        hdr_nbyte = 32 if self.use_cor_fmt else 56
        self.perf.mark_process(npkt * (hdr_nbyte + cfg.npol * cfg.npol
                                       * cfg.nchan * 8))
        return npkt


class CorrPartOutput:
    """Emit subselected visibilities, nvis_per_packet per packet
    (corr_output_part_block.py:346-364)."""

    def __init__(self, cfg, send=None, nvis_per_packet: int = 16,
                 max_mbps: int = -1, use_cor_fmt: bool = False):
        self.cfg = cfg
        self.send = send
        self.nvis_per_packet = nvis_per_packet
        self.use_cor_fmt = use_cor_fmt
        self.throttle = Throttle(max_mbps * 1e6 if max_mbps > 0 else None)

    def _send_subsel_cor(self, subsel_re: np.ndarray,
                         subsel_im: np.ndarray, baselines, spectra_id: int,
                         acc_len: int, sync_time: int) -> int:
        """COR-format fast visibilities: one dual-pol baseline per
        packet.  Stand labels come from the ACTUAL baselines map when
        available (each consecutive npol^2 group's stand pair); without
        one, from the upper-triangle enumeration bifrost's packetizer
        assumes (corr_output_part_block.py:366-401, 'assume ordered so
        all the stand0 baselines come first')."""
        cfg = self.cfg
        nchan_out, nvis = subsel_re.shape
        npp = cfg.npol * cfg.npol
        nbl = nvis // npp
        if baselines is not None:
            blmap = np.asarray(baselines).reshape(nbl, npp, 2, 2)
            stand_pairs = [(int(blmap[b, 0, 0, 0]) + 1,
                            int(blmap[b, 0, 1, 0]) + 1)
                           for b in range(nbl)]
        else:
            nstand_virt = int((-1 + np.sqrt(1 + 8 * nbl)) / 2)
            stand_pairs = [(i + 1, j + 1)
                           for i in range(nstand_virt)
                           for j in range(i, nstand_virt)][:nbl]
        frame_number, secs, freq, time_tag, navg = _cor_header_fields(
            cfg, sync_time, spectra_id, acc_len,
            nchan_sum=cfg.nchan_sum)
        # [nchan, nbl, p0, p1] view of the consecutive-npol^2 pol blocks
        re = subsel_re.reshape(nchan_out, nbl, cfg.npol, cfg.npol)
        im = subsel_im.reshape(nchan_out, nbl, cfg.npol, cfg.npol)
        npkt = 0
        for b, (si, sj) in enumerate(stand_pairs):
            data = np.empty((nchan_out, cfg.npol, cfg.npol, 2),
                            np.int32)
            data[..., 0] = re[:, b]
            data[..., 1] = im[:, b]
            hdr = pk.CorHeader(
                frame_number=frame_number, secs_count=secs,
                freq_count=freq, cor_gain=0, time_tag=time_tag,
                cor_navg=navg, stand_i=si, stand_j=sj)
            pkt = pk.encode_cor(hdr, data)
            self.send(pkt)
            self.throttle.account(8 * len(pkt))
            npkt += 1
        return npkt

    def send_subsel(self, subsel_re: np.ndarray, subsel_im: np.ndarray,
                    baselines: np.ndarray, sync_time: int, spectra_id: int,
                    acc_len: int) -> int:
        if self.send is None:
            return 0
        cfg = self.cfg
        if self.use_cor_fmt:
            return self._send_subsel_cor(subsel_re, subsel_im, baselines,
                                         spectra_id, acc_len, sync_time)
        nchan_out, nvis = subsel_re.shape
        bl = np.asarray(baselines, np.uint32)
        npkt = 0
        from ..ops.corr_subsel import subsel_output_sfreq

        sfreq = subsel_output_sfreq(cfg.sfreq_hz,
                                    cfg.nchan * cfg.chan_bw_hz,
                                    cfg.nchan, cfg.nchan_sum)
        for v0 in range(0, nvis, self.nvis_per_packet):
            v1 = min(v0 + self.nvis_per_packet, nvis)
            data = np.empty((v1 - v0, nchan_out, 2), np.int32)
            data[..., 0] = subsel_re[:, v0:v1].T
            data[..., 1] = subsel_im[:, v0:v1].T
            hdr = pk.CorrPartHeader(
                sync_time=sync_time, spectra_id=spectra_id,
                bw_hz=cfg.nchan * cfg.chan_bw_hz, sfreq_hz=sfreq,
                acc_len=acc_len, nvis=v1 - v0, nchans=nchan_out,
                chan0=cfg.chan0 // cfg.nchan_sum)
            pkt = pk.encode_corr_part(hdr, bl[v0:v1], data)
            self.send(pkt)
            self.throttle.account(8 * len(pkt))
            npkt += 1
        return npkt


class PBeamOutput:
    """Per-beam PBEAM streams; one packet per time sample per beam."""

    def __init__(self, cfg, senders: dict[int, object] | None = None,
                 pipeline_idx: int = 1):
        self.cfg = cfg
        self.senders = senders or {}
        self.pipeline_idx = pipeline_idx

    def send_powers(self, power: np.ndarray, seq0: int,
                    navg: int) -> int:
        """power: f32 [nbeam//2, nblock, nchan, 4]."""
        cfg = self.cfg
        npkt = 0
        nbeam2, nblock, nchan, _ = power.shape
        for b, send in self.senders.items():
            for t in range(nblock):
                hdr = pk.PBeamHeader(
                    server=self.pipeline_idx, beam=b + 1, gbe=0,
                    nchan=nchan, nbeam=1, nserver=cfg.npipeline,
                    navg=navg, chan0=cfg.chan0,
                    seq=seq0 + t * navg)
                send(pk.encode_pbeam(hdr, power[b, t][:, None, :]))
                npkt += 1
        return npkt


class IBeamOutput:
    """VLBI voltage-beam stream, burst-throttled
    (beamform_vlbi_output_block.py:202-275)."""

    MAX_BPS = 0.6e9

    def __init__(self, cfg, send=None, pipeline_idx: int = 1,
                 npacket_burst: int = 32):
        self.cfg = cfg
        self.send = send
        self.pipeline_idx = pipeline_idx
        self.throttle = Throttle(self.MAX_BPS,
                                 block_bits=npacket_burst * 8 * 1500)

    def send_voltages(self, vlbi: np.ndarray, seq0: int) -> int:
        """vlbi: f32 [ntime, nchan, nbeam, 2] (from vlbi_voltage_select)."""
        if self.send is None:
            return 0
        ntime, nchan, nbeam, _ = vlbi.shape
        npkt = 0
        for t in range(ntime):
            hdr = pk.IBeamHeader(server=self.pipeline_idx, gbe=0,
                                 nchan=nchan, nbeam=nbeam,
                                 nserver=self.cfg.npipeline,
                                 chan0=self.cfg.chan0, seq=seq0 + t)
            pkt = pk.encode_ibeam(hdr, vlbi[t])
            self.send(pkt)
            self.throttle.account(8 * len(pkt))
            npkt += 1
        return npkt


class TriggeredDump:
    """Dump the deep history ring to self-describing files.

    File = 8-byte little-endian total-size prefix + JSON header padded into
    a 1 MB block + raw frames (triggered_dump_block.py:131-151, 176-179,
    264-268); commands trigger/abort/stop with ntime_per_file / nfile /
    dump_path (164-169); reads start at the earliest resident frame (218).
    """

    HEADER_BLOCK = 1024 * 1024

    def __init__(self, history_ring, dump_path: str = ".",
                 file_prefix: str = "lwa-dump", direct: bool = False):
        self.ring = history_ring
        self.dump_path = dump_path
        self.file_prefix = file_prefix
        # O_DIRECT|O_SYNC writes, the reference's sustained-dump mode
        # (triggered_dump_block.py:260-263); falls back to buffered IO
        # on filesystems without O_DIRECT (e.g. tmpfs)
        self.direct = direct
        self.abort_requested = False

    def trigger(self, ntime_per_file: int, nfile: int = 1,
                dump_path: str | None = None) -> list[str]:
        # an 'abort'/'stop' issued while NO dump was running must not
        # stay latched and silently cancel this trigger at file 0
        self.abort_requested = False
        path = dump_path or self.dump_path
        files = []
        hdr0 = self.ring.header
        # samples per ring frame (frames are gulp-shaped); ADC-mode
        # frames hold f32 or int8 samples (header nbit) of [ninput]
        # (no channel axis)
        if hdr0.get("adc"):
            sample_nbyte = (hdr0.get("nbit", 32) // 8
                            * hdr0.get("nstand", 1) * hdr0.get("npol", 1))
        else:
            sample_nbyte = (hdr0.get("nchan", 1) * hdr0.get("nstand", 1)
                            * hdr0.get("npol", 1)) or 1
        spf = max(1, self.ring.frame_nbyte // sample_nbyte)
        # per-frame SEQUENCE step: seqs advance one ntime_gulp per
        # frame in both modes (ADC seqs stay in output-spectra units,
        # io/native.py AdcCaptureSource), so in ADC mode the 2*nchan
        # samples-per-spectrum factor must not leak into seq0
        seq_pf = (max(1, spf // (2 * hdr0["nchan"]))
                  if hdr0.get("adc") and hdr0.get("nchan")
                  else spf)
        frames_per_file = max(1, -(-ntime_per_file // spf))
        lo = self.ring.earliest()
        for i in range(nfile):
            if self.abort_requested:
                break
            # live capture keeps pushing during the dump; if it lapped
            # the cursor, skip forward to the earliest resident frame
            # (the reference re-opens at earliest,
            # triggered_dump_block.py:218) instead of dying on the
            # residency check
            while True:
                lo = max(lo, self.ring.earliest())
                n = min(frames_per_file, self.ring.count - lo)
                if n <= 0:
                    break
                try:
                    data = self.ring.snapshot(lo, n)
                    break
                except IndexError:
                    continue  # lapped between earliest() and snapshot
            if n <= 0:
                break
            hdr = dict(hdr0)
            hdr.update({"ntime": n * spf,
                        "seq0": self.ring.frame0_seq + lo * seq_pf,
                        "dump_index": i})
            fname = os.path.join(
                path, "%s_%d_%d.tbf" % (self.file_prefix,
                                        hdr.get("seq0", 0), i))
            self._write_file(fname, hdr, data)
            files.append(fname)
            lo += n
        self.abort_requested = False
        return files

    def _write_file(self, fname: str, header: dict, data: np.ndarray
                    ) -> None:
        hdr_json = json.dumps(header).encode()
        if len(hdr_json) > self.HEADER_BLOCK - 8:
            raise ValueError("header too large")
        total = self.HEADER_BLOCK + data.nbytes
        if self.direct and self._write_file_direct(fname, hdr_json,
                                                   data, total):
            return
        with open(fname, "wb") as fh:
            fh.write(total.to_bytes(8, "little"))
            fh.write(hdr_json)
            fh.write(b"\x00" * (self.HEADER_BLOCK - 8 - len(hdr_json)))
            fh.write(data.tobytes())

    def _write_file_direct(self, fname: str, hdr_json: bytes,
                           data: np.ndarray, total: int) -> bool:
        """O_DIRECT|O_SYNC body writes from a page-aligned mmap bounce
        buffer; the sub-page tail is appended buffered.  Returns False
        when the filesystem rejects O_DIRECT (caller falls back)."""
        import mmap

        if not hasattr(os, "O_DIRECT"):
            return False
        try:
            fd = os.open(fname, os.O_WRONLY | os.O_CREAT | os.O_TRUNC
                         | os.O_DIRECT | os.O_SYNC, 0o644)
        except OSError:
            return False
        try:
            raw = memoryview(data).cast("B")
            chunk_n = 32 << 20
            buf = mmap.mmap(-1, max(self.HEADER_BLOCK, chunk_n))
            # NB: slicing an mmap yields an UNALIGNED heap bytes copy,
            # which O_DIRECT rejects — always write memoryview slices
            # of the page-aligned mapping
            mv = memoryview(buf)
            buf[:8] = total.to_bytes(8, "little")
            buf[8:8 + len(hdr_json)] = hdr_json
            buf[8 + len(hdr_json):self.HEADER_BLOCK] = \
                b"\x00" * (self.HEADER_BLOCK - 8 - len(hdr_json))

            def write_all(view):
                # a short write (signal, ENOSPC) must not be reported as
                # success; retry the remainder — if the retry offset
                # breaks O_DIRECT alignment the kernel raises EINVAL and
                # the caller falls back to the buffered path
                done = 0
                while done < len(view):
                    n = os.write(fd, view[done:])
                    if n <= 0:
                        raise OSError("short write to %s" % fname)
                    done += n

            write_all(mv[:self.HEADER_BLOCK])
            aligned = len(raw) // 4096 * 4096
            off = 0
            while off < aligned:
                n = min(chunk_n, aligned - off)
                buf[:n] = raw[off:off + n]
                write_all(mv[:n])
                off += n
            os.close(fd)
            fd = -1
            if aligned < len(raw):
                with open(fname, "ab") as fh:
                    fh.write(raw[aligned:])
            return True
        except OSError:
            if fd >= 0:
                os.close(fd)
            return False

    def abort(self) -> None:
        self.abort_requested = True
