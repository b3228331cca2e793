"""Process manager + RPC service (XengineController parity)."""

import json
import sys
import time

from caltech_bifrost_dsp_tpu.control.manager import (XengineController,
                                                     XengineManagerService)
from caltech_bifrost_dsp_tpu.control.store import MemoryStore


def make_controller(tmp_path):
    # a dummy "pipeline": sleeps until killed
    return XengineController(
        pidfile_dir=str(tmp_path),
        pipeline_cmd=[sys.executable, "-c",
                      "import time,sys; time.sleep(60)", "--ignore"])


def test_start_stop_pipeline(tmp_path):
    ctl = make_controller(tmp_path)
    rv = ctl.start_pipeline(0)
    assert rv["ok"]
    assert ctl.pipeline_is_up(0)
    rv2 = ctl.start_pipeline(0)
    assert not rv2["ok"]  # already running
    assert ctl.stop_pipeline(0)["ok"]
    time.sleep(0.2)
    assert not ctl.pipeline_is_up(0)


def test_kill_pipelines(tmp_path):
    ctl = make_controller(tmp_path)
    ctl.start_pipeline(1)
    ctl.start_pipeline(2)
    ctl.kill_pipelines()
    assert not ctl.pipeline_is_up(1)
    assert not ctl.pipeline_is_up(2)


def test_rpc_dispatch_and_underscore_guard(tmp_path):
    store = MemoryStore()
    ctl = make_controller(tmp_path)
    svc = XengineManagerService(store, ctl)

    def rpc(cmd, **kwargs):
        store.put(svc.cmd_key, json.dumps(
            {"cmd": cmd, "id": "7", "val": {"kwargs": kwargs}}))
        return json.loads(store.get(svc.resp_key))["val"]

    r = rpc("status")
    assert r["status"] == "normal"
    r = rpc("start_pipeline", pipeline_id=3)
    assert r["status"] == "normal" and ctl.pipeline_is_up(3)
    r = rpc("stop_pipeline", pipeline_id=3)
    assert r["status"] == "normal"
    # private methods are not remotely callable
    r = rpc("_pid_alive", pid=1)
    assert r["status"] == "error"
    r = rpc("no_such_method")
    assert r["status"] == "error"
    svc.close()
    ctl.kill_pipelines()
