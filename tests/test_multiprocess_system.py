"""Whole-system multi-process test: the host manager spawns a REAL
pipeline subprocess, which is monitored and controlled from this process
purely over the bundled TCP KV store (no etcd, no shared memory) —
the reference's manager/etcd/pipeline topology end to end."""

import json
import os
import sys
import time

import pytest

from caltech_bifrost_dsp_tpu.control.client import (CorrControlClient,
                                                    PipelineControl)
from caltech_bifrost_dsp_tpu.control.manager import XengineController
from caltech_bifrost_dsp_tpu.control.netstore import NetStore, StoreServer


def test_manager_pipeline_roundtrip(tmp_path):
    srv = StoreServer(port=0)
    kv = f"kv://127.0.0.1:{srv.port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    ctl = XengineController(
        pidfile_dir=str(tmp_path),
        pipeline_cmd=[sys.executable, "-m",
                      "caltech_bifrost_dsp_tpu.scripts.pipeline",
                      "--fakesource", "--etcdhost", kv,
                      "--nchan", "16", "--nstand", "16", "--nbeam", "4",
                      "--ntime_gulp", "48", "--acc_len", "240",
                      "--acc_len_slow", "480", "--ngulp", "0"])
    # make the subprocess inherit the CPU-forcing env
    import subprocess

    orig_popen = subprocess.Popen
    subprocess.Popen = lambda cmd, **kw: orig_popen(cmd, env=env, **kw)
    try:
        rv = ctl.start_pipeline(0)
    finally:
        subprocess.Popen = orig_popen
    assert rv["ok"]
    try:
        store = NetStore(port=srv.port)
        cli = CorrControlClient(store=store, timeout_s=20.0)
        pl = PipelineControl(cli, __import__("socket").gethostname(), 0)
        # wait for the pipeline's monitor bridge to publish running state
        deadline = time.time() + 120
        state = None
        while time.time() < deadline:
            try:
                st = pl.corr.get_status()
                state = st.get("stats", {}).get("state")
                if state == "running":
                    break
            except Exception:
                pass
            time.sleep(0.5)
        assert state == "running", f"pipeline never ran (state={state})"
        # command round trip into the live subprocess
        resp = pl.corr.set_acc_length(480)
        assert resp["status"] == "normal"
    finally:
        ctl.stop_pipeline(0)
        srv.close()
    assert not ctl.pipeline_is_up(0)
