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


def test_two_host_manager_orchestration(tmp_path):
    """TWO manager daemons ('hosts' — distinct xctrl keys) on ONE
    shared KV store, each spawning a REAL pipeline subprocess via the
    manager RPC; CorrelatorControl then arms BOTH pipelines with the
    two-phase waiting->running verification and a COMMON start index —
    the reference's multi-server flow (Lwa352CorrelatorControl
    start_pipelines + _arm_and_wait across the 8-9 X-engine servers,
    lwa352_pipeline_control.py:102-207)."""
    import socket
    import subprocess

    from caltech_bifrost_dsp_tpu.control.client import CorrelatorControl
    from caltech_bifrost_dsp_tpu.control.manager import \
        XengineManagerService

    srv = StoreServer(port=0)
    kv = f"kv://127.0.0.1:{srv.port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)

    # throttle the fakesources to the REAL-TIME rate (16 chan x 32
    # inputs x 23.926 kHz x 8 bit ~= 0.098 Gb/s): wall-clock arming
    # computes a future spectra index from the spectra rate, so an
    # unthrottled stream races past it between command and gulp —
    # the reference's streams are inherently real-time
    base_cmd = [sys.executable, "-m",
                "caltech_bifrost_dsp_tpu.scripts.pipeline",
                "--fakesource", "--etcdhost", kv,
                "--nchan", "16", "--nstand", "16", "--nbeam", "4",
                "--ntime_gulp", "48", "--acc_len", "240",
                "--acc_len_slow", "480", "--ngulp", "0",
                "--target_throughput", "0.098"]
    hosts = ["xhost-a", "xhost-b"]
    ctls, svcs = [], []
    for host in hosts:
        pdir = tmp_path / host
        pdir.mkdir()
        ctl = XengineController(pidfile_dir=str(pdir),
                                pipeline_cmd=base_cmd)
        ctl.hostname = host          # two 'servers' on one box
        ctls.append(ctl)
        svcs.append(XengineManagerService(NetStore(port=srv.port), ctl))

    store = NetStore(port=srv.port)

    def rpc(host_i, cmd, **kwargs):
        key = svcs[host_i].cmd_key
        store.put(key, json.dumps({"cmd": cmd, "id": f"rpc-{cmd}",
                                   "val": {"kwargs": kwargs}}))
        deadline = time.time() + 20
        while time.time() < deadline:
            raw = store.get(svcs[host_i].resp_key)
            if raw:
                v = json.loads(raw)
                if v.get("id") == f"rpc-{cmd}":
                    return v["val"]
            time.sleep(0.05)
        raise TimeoutError(cmd)

    orig_popen = subprocess.Popen
    subprocess.Popen = lambda cmd, **kw: orig_popen(cmd, env=env, **kw)
    try:
        for i in range(2):
            r = rpc(i, "start_pipeline", pipeline_id=i)
            assert r["status"] == "normal" and r["response"]["ok"]
    finally:
        subprocess.Popen = orig_popen

    try:
        cli = CorrControlClient(store=NetStore(port=srv.port),
                                timeout_s=30.0)
        realhost = socket.gethostname()
        pls = [PipelineControl(cli, realhost, i) for i in range(2)]

        # wait until both pipelines' control planes answer
        deadline = time.time() + 120
        up = set()
        while time.time() < deadline and len(up) < 2:
            for i, pl in enumerate(pls):
                if i in up:
                    continue
                try:
                    st = pl.corr.get_status()
                    if st.get("stats", {}).get("state"):
                        up.add(i)
                except Exception:
                    pass
            time.sleep(0.5)
        assert up == {0, 1}, f"pipelines up: {up}"

        # cross-host two-phase arm: both must reach waiting -> running
        # on the SAME commanded start index
        corr = CorrelatorControl(cli, pls)
        start = corr.arm_and_wait(delay_s=6.0, timeout_s=90.0)
        # the commanded start lands on the gulp grid (the integration
        # grid is stream-relative — phase set by the source's seq0)
        assert start % 48 == 0
        for pl in pls:
            st = pl.corr.get_status()["stats"]
            # arm_and_wait verified the post-arm transition (its phase
            # checks gate on curr_sample >= start); the command-echo
            # key proves BOTH received the same commanded start
            assert st.get("state") == "running", st
            assert int(st["new_start_time"]) == start, st
            assert int(st["curr_sample"]) >= start, st
    finally:
        for i in range(2):
            try:
                rpc(i, "stop_pipeline", pipeline_id=i)
            except Exception:
                ctls[i].kill_pipelines()
        for s in svcs:
            s.close()
        srv.close()
    for i, ctl in enumerate(ctls):
        assert not ctl.pipeline_is_up(i)
