"""Regressions from the round-4 control-plane/IO review."""

import json
import time

import numpy as np
import pytest

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.control import client as ctl
from caltech_bifrost_dsp_tpu.control.command import CommandBlock
from caltech_bifrost_dsp_tpu.control.monitor import MonitorBridge
from caltech_bifrost_dsp_tpu.control.netstore import NetStore, StoreServer
from caltech_bifrost_dsp_tpu.control.store import MemoryStore

CFG = cfgmod.TINY


@pytest.fixture
def netstore():
    srv = StoreServer("127.0.0.1", 0)
    cli = NetStore("127.0.0.1", srv.port)
    yield srv, cli
    cli.close()
    srv.close()


def test_netstore_watch_survives_idle_beyond_rpc_timeout(netstore):
    """The watch event stream must not inherit the 5 s RPC connect
    timeout — an idle gap killed the watch thread silently and the
    client went deaf while still registered."""
    srv, cli = netstore
    got = []
    cli.add_watch_prefix_callback("/idle", lambda wr: got.extend(
        (e.key, e.value) for e in wr.events))
    time.sleep(5.6)  # longer than the 5 s RPC timeout
    cli.put("/idle/x", "hello")
    deadline = time.time() + 5
    while not got and time.time() < deadline:
        time.sleep(0.05)
    assert got == [("/idle/x", "hello")]


def test_netstore_put_survives_cancelled_watch(netstore):
    """A cancelled watch leaves a server-side closed wfile; the next
    put under that prefix previously died with ValueError and the
    stale watcher was never pruned (store poisoned)."""
    srv, cli = netstore
    wid = cli.add_watch_prefix_callback("/resp", lambda wr: None)
    cli.cancel_watch(wid)
    time.sleep(0.2)  # let the server handler observe the close
    for i in range(3):  # repeated puts must all succeed
        cli.put("/resp/k", str(i))
    assert cli.get("/resp/k") == "2"
    # live watches still receive after the stale one was pruned
    got = []
    cli.add_watch_prefix_callback("/resp", lambda wr: got.extend(
        e.value for e in wr.events))
    cli.put("/resp/k2", "v")
    deadline = time.time() + 5
    while not got and time.time() < deadline:
        time.sleep(0.05)
    assert got == ["v"]


def test_pipeline_is_up_from_real_bridge_publish():
    """Liveness must read the timestamp the monitor bridge actually
    publishes (top-level 'time'); it previously looked only for a
    'last_update_time' key nothing writes, reporting every healthy
    pipeline as down."""
    store = MemoryStore()
    CommandBlock.set_id(0)
    CommandBlock.reset_instance_counts()
    CommandBlock("Corr", store=store, host=__import__("socket")
                 .gethostname()).update_stats({"state": "running"})
    MonitorBridge(store, pipeline_id=0).publish_once()
    cli = ctl.CorrControlClient(store=store, timeout_s=2.0)
    pl = ctl.PipelineControl(cli, __import__("socket").gethostname(), 0)
    assert pl.pipeline_is_up(max_age_s=30.0)


def test_command_ids_are_client_unique():
    """Two clients share one last-write-wins response key; bare
    sequential ids let them consume each other's responses."""
    a = ctl.CorrControlClient(store=MemoryStore(), timeout_s=1.0)
    b = ctl.CorrControlClient(store=MemoryStore(), timeout_s=1.0)
    ids_a = {a._next_seq() for _ in range(5)}
    ids_b = {b._next_seq() for _ in range(5)}
    assert not ids_a & ids_b


def test_stop_pipeline_reaps_child_promptly(tmp_path):
    """A SIGTERM'd child becomes a zombie until reaped; os.kill(pid,0)
    'succeeds' on zombies, so every clean stop previously burned the
    whole 10 s timeout and SIGKILLed a corpse."""
    from caltech_bifrost_dsp_tpu.control.manager import XengineController

    import sys

    mgr = XengineController(
        pidfile_dir=str(tmp_path),
        pipeline_cmd=[sys.executable, "-c",
                      "import time; time.sleep(600)"])
    r = mgr.start_pipeline(0)
    assert r["ok"]
    t0 = time.monotonic()
    r = mgr.stop_pipeline(0, timeout_s=10.0)
    dt = time.monotonic() - t0
    assert r["ok"]
    assert dt < 5.0, f"stop took {dt:.1f}s (zombie wait regression)"


def test_abort_before_trigger_does_not_cancel_it(tmp_path):
    """An 'abort' while idle must not latch and silently cancel the
    NEXT trigger."""
    from caltech_bifrost_dsp_tpu.io.sink import TriggeredDump
    from caltech_bifrost_dsp_tpu.io.source import sequence_header
    from caltech_bifrost_dsp_tpu.runtime.ring import HistoryRing

    ring = HistoryRing(8 * CFG.gulp_nbyte, CFG.gulp_nbyte)
    ring.set_header(sequence_header(CFG, seq0=0), 0)
    rng = np.random.RandomState(2)
    for _ in range(4):
        ring.push(rng.randint(0, 256, CFG.gulp_nbyte).astype(np.uint8))
    d = TriggeredDump(ring, direct=False)
    d.abort()  # idle abort — previously latched
    files = d.trigger(CFG.ntime_gulp, nfile=1, dump_path=str(tmp_path))
    assert len(files) == 1


def test_multi_instance_blocks_publish_distinct_status_keys():
    """Two instances of one block must not alias: previously the 2nd
    instance replaced the 1st's proclog entry and the bridge published
    it under instance 0's key."""
    store = MemoryStore()
    CommandBlock.set_id(0)
    CommandBlock.reset_instance_counts()
    host = __import__("socket").gethostname()
    b0 = CommandBlock("CorrOutputFull", store=store, host=host)
    b1 = CommandBlock("CorrOutputFull", store=store, host=host)
    b0.update_stats({"state": "zero"})
    b1.update_stats({"state": "one"})
    MonitorBridge(store, pipeline_id=0).publish_once()
    cli = ctl.CorrControlClient(store=store, timeout_s=2.0)
    s0 = cli.get_status(host, 0, "CorrOutputFull", 0)
    s1 = cli.get_status(host, 0, "CorrOutputFull", 1)
    assert s0["stats"]["state"] == "zero"
    assert s1["stats"]["state"] == "one"
    assert s1["instance"] == 1
