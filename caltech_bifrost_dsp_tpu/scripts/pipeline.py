"""X-engine pipeline CLI.

The analog of the reference's ``lwa352-pipeline.py`` operator entry point
(reference: pipeline/scripts/lwa352-pipeline.py:313-342): assembles one
pipeline instance (source -> fused TPU step -> sinks) from argparse flags,
wires the control store, installs signal handlers, and runs.

Examples::

  # synthetic ramp source, no outputs, 1000 gulps
  python -m caltech_bifrost_dsp_tpu.scripts.pipeline --fakesource \
      --ngulp 1000

  # golden-vector verification run (test_pipeline.sh analog)
  python -m caltech_bifrost_dsp_tpu.scripts.pipeline --fakesource \
      --testdatain in.dat --testdatacorr corr.dat --ngulp 2000

  # UDP capture via the native C++ engine
  python -m caltech_bifrost_dsp_tpu.scripts.pipeline --ip 0.0.0.0 \
      --port 10000 --corr-dest 10.1.1.1:10001
"""

from __future__ import annotations

import argparse
import logging
import logging.handlers
import signal
import sys
import time

import numpy as np

from ..config import LWA352, XEngineConfig
from ..control.command import CommandBlock
from ..control.monitor import MonitorBridge
from ..control.store import connect
from ..io import sink, source
from ..runtime.driver import XEnginePipeline


def setup_logging(logfile: str | None, verbosity: int) -> logging.Logger:
    """UTC-formatted logging (reference: lwa352-pipeline.py:86-99)."""
    log = logging.getLogger(__name__)
    fmt = logging.Formatter(
        "%(asctime)s [%(levelname)-8s] %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")
    fmt.converter = time.gmtime
    handler = (logging.StreamHandler(sys.stdout) if logfile is None
               else logging.handlers.TimedRotatingFileHandler(
                   logfile, when="D", backupCount=21, utc=True))
    handler.setFormatter(fmt)
    log.addHandler(handler)
    log.setLevel(logging.DEBUG if verbosity > 0 else
                 logging.INFO if verbosity == 0 else logging.WARNING)
    return log


def _dest(s: str):
    ip, _, port = s.partition(":")
    return ip, int(port or 10000)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="TPU-native LWA-352 X-engine pipeline",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("-P", "--pipelineid", type=int, default=0)
    p.add_argument("-c", "--nchan", type=int, default=LWA352.nchan)
    p.add_argument("--nstand", type=int, default=LWA352.nstand)
    p.add_argument("--nbeam", type=int, default=LWA352.nbeam)
    p.add_argument("-a", "--acc_len", type=int, default=LWA352.acc_len)
    p.add_argument("--acc_len_slow", type=int,
                   default=LWA352.acc_len_slow)
    p.add_argument("-t", "--ntime_gulp", type=int,
                   default=LWA352.ntime_gulp)
    p.add_argument("--autostartat", type=int, default=0,
                   help="-1 starts on the next boundary")
    p.add_argument("--fakesource", action="store_true",
                   help="use the synthetic DummySource instead of UDP")
    p.add_argument("--testdatain", type=str, default=None,
                   help="golden input .dat file to loop")
    p.add_argument("--testdatacorr", type=str, default=None,
                   help="golden correlation .dat for the equality gate")
    p.add_argument("--testdatacorr_acc_len", type=int, default=2400)
    p.add_argument("--target_throughput", type=float, default=1000.0)
    p.add_argument("--ip", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=10000)
    p.add_argument("--corr-dest", type=str, default=None,
                   metavar="IP:PORT")
    p.add_argument("--subsel-dest", type=str, default=None)
    p.add_argument("--pbeam-dest", type=str, default=None)
    p.add_argument("--ibeam-dest", type=str, default=None)
    p.add_argument("--max_mbps", type=int, default=1500)
    p.add_argument("--cor-fmt", action="store_true",
                   help="emit the production LWA-SV COR (Mark5C) wire "
                        "format on the full/partial visibility outputs "
                        "(reference use_cor_fmt=True default)")
    p.add_argument("--dump-direct", action="store_true",
                   help="O_DIRECT|O_SYNC triggered-dump writes (the "
                        "reference's sustained-dump mode; falls back "
                        "on filesystems without O_DIRECT)")
    p.add_argument("--bufgbytes", type=float, default=0.0,
                   help="deep trigger-history buffer size in GB")
    p.add_argument("--ngulp", type=int, default=0,
                   help="stop after N gulps (0 = run forever)")
    p.add_argument("--testcorr", action="store_true",
                   help="run a (slow) numpy correlator alongside and "
                        "compare every fast dump exactly")
    p.add_argument("--fx", action="store_true",
                   help="FX mode: source provides raw ADC samples; the "
                        "device step prepends PFB channelization")
    p.add_argument("--pfb-impl", type=str, default="matmul",
                   choices=["matmul", "fft"],
                   help="PFB transform: matmul real-DFT (works on every "
                        "backend) or XLA rfft (faster on backends whose "
                        "compiler supports the FFT lowering)")
    p.add_argument("--corr-engine", type=str, default="auto",
                   choices=["auto", "xla", "pallas_triu", "pallas_blk"],
                   help="correlator engine: dense XLA matmuls, or the "
                        "triangular Pallas kernels (pallas_blk = "
                        "256-block int8 Karatsuba, the fast one on "
                        "v5e); 'auto' = the committed production "
                        "choice for the backend (config.TPU_ENGINES)")
    p.add_argument("--bf-engine", type=str, default="auto",
                   choices=["auto", "xla", "pallas"],
                   help="beamformer engine: XLA matmuls + power pass, "
                        "or the fused Pallas kernel (voltages never "
                        "touch HBM); 'auto' per backend")
    p.add_argument("--subsel-engine", type=str, default="auto",
                   choices=["auto", "bands", "xla", "pallas"],
                   help="baseline-subselection engine: 2-D "
                        "block-compacted slab DMA + small take (falls "
                        "back in-graph for band-dense selections), XLA "
                        "flat take(), or the Pallas lane-gather kernel "
                        "(bit-identical output); 'auto' per backend")
    p.add_argument("--pfb-engine", type=str, default="xla",
                   choices=["xla", "pallas"],
                   help="FX channelizer engine: XLA matmul path or the "
                        "fused Pallas FIR+DFT+requant kernel")
    p.add_argument("--pfb-precision", type=str, default="high",
                   choices=["high", "bf16"])
    p.add_argument("--adc-dtype", type=str, default="float32",
                   choices=["float32", "int8"],
                   help="FX-mode raw ADC sample dtype; int8 is the "
                        "production-faithful 8-bit digitizer path (4x "
                        "less staging/H2D/HBM/halo traffic, products "
                        "bit-identical for integer-valued input)")
    p.add_argument("--quant-scale", type=float, default=1.0,
                   help="FX-mode 4-bit requantization gain")
    p.add_argument("--eq-gains", type=str, default=None, metavar="FILE",
                   help="FX-mode per-channel EQ gains: .npy or text file "
                        "of nchan positive floats (multiplied into "
                        "quant-scale; runtime-updatable via the FEngine "
                        "'eq_gains' command key)")
    p.add_argument("--fx-tone-chan", type=int, default=-1,
                   help="FX fakesource: put a test tone in this channel")
    p.add_argument("--adc-amplitude", type=float, default=None,
                   help="FX fakesource signal amplitude in ADC units "
                        "(default 4.0 for float32, 32.0 for int8 — "
                        "integer ADC counts need headroom above the "
                        "rounding step)")
    p.add_argument("--mesh", type=str, default=None, metavar="TIMExCHAN",
                   help="run the fused step sharded over a device mesh, "
                        "e.g. '2x4' (time x chan axes)")
    p.add_argument("--xdp", type=str, default=None, metavar="IFNAME",
                   help="AF_XDP kernel-bypass capture on this interface "
                        "(the reference's --ibverbs UDPVerbsCapture "
                        "analog, capture_block.py:180-189); packets "
                        "must fit the 4 KB UMEM chunk")
    p.add_argument("--xdp-queue", type=int, default=0,
                   help="NIC queue id for --xdp")
    p.add_argument("--etcdhost", type=str, default=None,
                   help="etcd server (in-memory store when omitted)")
    p.add_argument("-l", "--logfile", type=str, default=None)
    p.add_argument("-v", "--verbose", action="count", default=0)
    p.add_argument("-q", "--quiet", action="count", default=0)
    return p


def build_pipeline(args, log) -> XEnginePipeline:
    from ..config import default_engines

    engines = default_engines()
    for key in ("corr_engine", "bf_engine", "subsel_engine"):
        chosen = getattr(args, key)
        if chosen != "auto":
            engines[key] = chosen
    cfg = XEngineConfig(
        nstand=args.nstand, nchan=args.nchan, nbeam=args.nbeam,
        ntime_gulp=args.ntime_gulp, acc_len=args.acc_len,
        acc_len_slow=args.acc_len_slow, pipeline_id=args.pipelineid,
        pfb_fft_impl=args.pfb_impl, pfb_engine=args.pfb_engine,
        pfb_precision=args.pfb_precision, adc_dtype=args.adc_dtype,
        **engines)
    CommandBlock.set_id(args.pipelineid)
    store = connect(args.etcdhost)

    if args.fx:
        if not args.fakesource:
            # real UDP ADC ingest: int8 digitizer frames over the snap2
            # wire format through the native capture engine
            if args.adc_dtype != "int8":
                raise SystemExit("--fx UDP capture requires "
                                 "--adc-dtype int8 (the digitizer "
                                 "width); f32 is fakesource-only")
            from ..io import native

            src = native.AdcCaptureSource(cfg, args.ip, args.port,
                                          xdp_ifname=args.xdp,
                                          xdp_queue=args.xdp_queue)
        else:
            amp = args.adc_amplitude
            if amp is None:
                amp = 32.0 if args.adc_dtype == "int8" else 4.0
            if args.fx_tone_chan >= 0:
                src = source.ADCSource(cfg, mode="tone",
                                       tone_chan=args.fx_tone_chan,
                                       amplitude=amp)
            else:
                src = source.ADCSource(cfg, mode="noise", amplitude=amp)
    elif args.fakesource:
        if args.testdatain:
            src = source.DummySource(
                cfg, mode="testfile", testfile=args.testdatain,
                target_throughput_gbps=args.target_throughput)
        else:
            src = source.DummySource(
                cfg, mode="ramp",
                target_throughput_gbps=args.target_throughput)
    else:
        from .. io import native

        src = native.CaptureSource(cfg, args.ip, args.port,
                                   xdp_ifname=args.xdp,
                                   xdp_queue=args.xdp_queue)

    corr_outputs = []
    if args.corr_dest or args.testdatacorr:
        send = (sink.UdpSender(*_dest(args.corr_dest))
                if args.corr_dest else None)
        corr_outputs.append(sink.CorrFullOutput(
            cfg, send=send, max_mbps=args.max_mbps,
            checkfile=args.testdatacorr,
            checkfile_acc_len=args.testdatacorr_acc_len,
            use_cor_fmt=args.cor_fmt))
    subsel_outputs = []
    if args.subsel_dest:
        subsel_outputs.append(sink.CorrPartOutput(
            cfg, send=sink.UdpSender(*_dest(args.subsel_dest)),
            use_cor_fmt=args.cor_fmt))
    pbeam_outputs = []
    if args.pbeam_dest:
        ip, port = _dest(args.pbeam_dest)
        pbeam_outputs.append(sink.PBeamOutput(
            cfg, senders={b: sink.UdpSender(ip, port + b)
                          for b in range(cfg.nbeam // 2)},
            pipeline_idx=args.pipelineid + 1))
    ibeam_outputs = []
    if args.ibeam_dest:
        ibeam_outputs.append(sink.IBeamOutput(
            cfg, send=sink.UdpSender(*_dest(args.ibeam_dest)),
            pipeline_idx=args.pipelineid + 1))

    mesh = None
    if args.mesh:
        from ..parallel.mesh import make_mesh

        n_time, _, n_chan = args.mesh.partition("x")
        mesh = make_mesh(int(n_time), int(n_chan))

    eq_gains = None
    if args.eq_gains:
        if args.eq_gains.endswith(".npy"):
            eq_gains = np.load(args.eq_gains).astype(float).tolist()
        else:
            eq_gains = np.loadtxt(args.eq_gains).astype(float).tolist()

    pipe = XEnginePipeline(
        cfg, src, store=store, corr_outputs=corr_outputs,
        subsel_outputs=subsel_outputs, pbeam_outputs=pbeam_outputs,
        ibeam_outputs=ibeam_outputs, mesh=mesh,
        dump_direct=args.dump_direct,
        history_nbyte=int(args.bufgbytes * 1e9),
        autostartat=args.autostartat, sync_time=int(time.time()),
        selftest=args.testcorr, fx_mode=args.fx,
        quant_scale=args.quant_scale, eq_gains=eq_gains)
    bridge = MonitorBridge(store, pipeline_id=args.pipelineid)
    bridge.start()
    pipe._monitor_bridge = bridge
    return pipe


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    log = setup_logging(args.logfile, args.verbose - args.quiet)
    pipe = build_pipeline(args, log)

    def _shutdown(signum, frame):
        log.info("signal %d: shutting down", signum)
        pipe.shutdown()

    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, _shutdown)
    log.info("pipeline %d starting (nchan=%d nstand=%d)",
             args.pipelineid, args.nchan, args.nstand)
    pipe.run(args.ngulp)
    for out in pipe.corr_outputs:
        if out.checkfile:
            log.info("golden check: %d/%d passed",
                     out.check_count - out.check_failures,
                     out.check_count)
            if out.check_failures:
                return 1
    if pipe.selftest:
        log.info("selftest: %d/%d passed",
                 pipe.selftest_count - pipe.selftest_failures,
                 pipe.selftest_count)
        if pipe.selftest_failures:
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
