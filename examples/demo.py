"""End-to-end demo of the TPU X-engine library API.

Runs a miniature observation entirely in software: golden-vector input,
fused correlate+beamform pipeline with runtime control, product
packetization and triggered voltage dump — then verifies the correlation
products exactly.

    python examples/demo.py
"""

import json
import os
import sys
import tempfile

import numpy as np

# runnable as `python examples/demo.py` from anywhere (the package is
# not pip-installed; sys.path[0] is examples/, not the repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# the demo is a miniature CPU walkthrough — keep it off any accelerator
# (env alone is not enough where sitecustomize pins a backend)
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.control.client import (CorrControlClient,
                                                    PipelineControl)
from caltech_bifrost_dsp_tpu.control.monitor import render_text
from caltech_bifrost_dsp_tpu.control.store import MemoryStore
from caltech_bifrost_dsp_tpu.io import packets as pk
from caltech_bifrost_dsp_tpu.io import sink, source
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline
from caltech_bifrost_dsp_tpu.verification import golden


def main():
    cfg = cfgmod.TINY
    tmp = tempfile.mkdtemp(prefix="cbd-demo-")
    ntime = 2 * cfg.acc_len_slow

    print("1. generating golden vectors ...")
    in_path = os.path.join(tmp, "in.dat")
    corr_path = os.path.join(tmp, "corr.dat")
    golden.write_input_file(in_path, ntime, cfg.nchan, cfg.nstand,
                            cfg.npol, cfg.acc_len)
    golden.write_corr_file(corr_path, ntime, cfg.nchan, cfg.nstand,
                           cfg.npol, cfg.acc_len)

    print("2. building the pipeline ...")
    store = MemoryStore()
    src = source.DummySource(cfg, mode="testfile", testfile=in_path)
    cor_pkts, pbeam_pkts = [], []
    corr_out = sink.CorrFullOutput(cfg, send=cor_pkts.append,
                                   checkfile=corr_path,
                                   checkfile_acc_len=cfg.acc_len)
    pb_out = sink.PBeamOutput(cfg, senders={0: pbeam_pkts.append})
    pipe = XEnginePipeline(cfg, src, store=store,
                           corr_outputs=[corr_out],
                           pbeam_outputs=[pb_out],
                           history_nbyte=16 * cfg.gulp_nbyte)

    print("3. loading beam coefficients over the control plane ...")
    cli = CorrControlClient(store=store)
    ctl = PipelineControl(cli, __import__("socket").gethostname(), 0)
    for b in range(cfg.nbeam):
        ctl.beamform.update_delays(b, np.zeros(cfg.ninput),
                                   load_sample=-1)

    print("4. running ...")
    pipe.run(ntime // cfg.ntime_gulp, timeout_s=600)

    print("5. triggering a voltage dump ...")
    files = pipe.dumper.trigger(ntime_per_file=cfg.ntime_gulp, nfile=1,
                                dump_path=tmp)
    replay = source.TriggerFileSource(files[0])
    hdr, _ = replay.read()

    print("6. results:")
    print(f"   fast dumps: {pipe.ndump_fast}, slow dumps:"
          f" {pipe.ndump_slow}")
    print(f"   golden checks passed: "
          f"{corr_out.check_count - corr_out.check_failures}"
          f"/{corr_out.check_count}")
    print(f"   COR packets: {len(cor_pkts)}, PBEAM packets:"
          f" {len(pbeam_pkts)}")
    h, d = pk.decode_corr_full(cor_pkts[0])
    print(f"   first COR packet: stands ({h.stand0},{h.stand1}), "
          f"acc_len {h.acc_len}")
    print(f"   dump file: {os.path.basename(files[0])} "
          f"({hdr['ntime']} samples from spectra {hdr['seq0']})")
    from caltech_bifrost_dsp_tpu.control.monitor import MonitorBridge

    MonitorBridge(store).publish_once()
    print("   monitor:")
    for line in render_text(store).splitlines()[:4]:
        print("    ", line)
    assert corr_out.check_failures == 0
    print("demo OK")


if __name__ == "__main__":
    main()
