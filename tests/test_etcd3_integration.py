"""etcd v3 wire-protocol integration: watch -> command -> response
through control.store.Etcd3Store over REAL gRPC.

The reference's control plane is etcd3 (etcd_control.py:229-314).  The
framework speaks the etcd v3 gRPC API directly (control/etcd3_wire.py),
so this always runs against the bundled etcd-protocol server
(Etcd3Server, genuine gRPC over TCP — Put/Range/prefix Watch on the
etcdserverpb wire format), and ADDITIONALLY against a real `etcd`
binary when one is on PATH (none is bundled in the CI image).
"""

import json
import shutil
import subprocess
import time

import pytest

from caltech_bifrost_dsp_tpu.control.etcd3_wire import (
    Etcd3Server, dec_msg, enc_msg, prefix_range_end)
from caltech_bifrost_dsp_tpu.control.store import Etcd3Store

ETCD_BIN = shutil.which("etcd")


@pytest.fixture
def wire_server():
    svr = Etcd3Server("127.0.0.1", 0)
    try:
        yield svr.port
    finally:
        svr.stop()


@pytest.fixture
def etcd_server(tmp_path):
    if ETCD_BIN is None:
        pytest.skip("no `etcd` binary on PATH — the bundled-server test "
                    "above still covers the gRPC wire path")
    port, peer = 23791, 23801
    proc = subprocess.Popen(
        [ETCD_BIN, "--data-dir", str(tmp_path / "etcd"),
         "--listen-client-urls", f"http://127.0.0.1:{port}",
         "--advertise-client-urls", f"http://127.0.0.1:{port}",
         "--listen-peer-urls", f"http://127.0.0.1:{peer}"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        store = None
        for _ in range(50):
            try:
                store = Etcd3Store(host="127.0.0.1", port=port)
                store.put("/probe", "1")
                break
            except Exception:
                time.sleep(0.2)
        else:
            pytest.skip("etcd server failed to start")
        store.close()
        yield port
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_proto_codec_roundtrip():
    """The hand-rolled proto3 codec must round-trip nested messages and
    honor the etcd prefix range_end convention."""
    inner = enc_msg((1, b"/cmd/corr"), (3, 42), (5, b"payload"))
    outer = enc_msg((1, inner), (2, 7), (11, inner), (11, inner))
    d = dec_msg(outer)
    assert d[2] == [7] and len(d[11]) == 2
    di = dec_msg(d[1][0])
    assert di[1] == [b"/cmd/corr"] and di[3] == [42]
    assert prefix_range_end(b"/cmd") == b"/cme"
    assert prefix_range_end(b"a\xff") == b"b"


def _command_round_trip(port):
    from caltech_bifrost_dsp_tpu.control.command import CommandBlock

    store = Etcd3Store(host="127.0.0.1", port=port)
    try:
        blk = CommandBlock("Corr", store=store)
        blk.define_command_key("acc_len", type=int, initial_val=2400,
                               condition=lambda x: x % 240 == 0)
        cmd_key = blk.command_key
        resp_key = blk.response_key
        store.put(cmd_key, json.dumps(
            {"id": "77", "cmd": "update",
             "val": {"kwargs": {"acc_len": 4800}}}))
        deadline = time.time() + 10
        resp = None
        while time.time() < deadline:
            raw = store.get(resp_key)
            if raw:
                resp = json.loads(raw)
                if str(resp.get("id")) == "77":
                    break
            time.sleep(0.05)
        assert resp is not None and str(resp["id"]) == "77"
        assert resp["val"]["status"] == "normal"
        assert blk.update_pending
        blk.update_command_vals()
        assert blk.command_vals["acc_len"] == 4800
        # invalid value -> rejected with code -3 semantics
        store.put(cmd_key, json.dumps(
            {"id": "78", "cmd": "update",
             "val": {"kwargs": {"acc_len": 7}}}))
        deadline = time.time() + 10
        while time.time() < deadline:
            raw = store.get(resp_key)
            if raw and str(json.loads(raw).get("id")) == "78":
                assert json.loads(raw)["val"]["response"] != 0
                break
            time.sleep(0.05)
        else:
            pytest.fail("no response to invalid command")
    finally:
        store.close()


def test_command_round_trip_over_wire_server(wire_server):
    """CommandBlock round trip over genuine gRPC against the bundled
    etcd-protocol server — the etcd3 path executed, no skip."""
    _command_round_trip(wire_server)


def test_kv_and_prefix_watch_over_wire_server(wire_server):
    store = Etcd3Store(host="127.0.0.1", port=wire_server)
    try:
        store.put("/mon/a", "1")
        store.put("/mon/b", "2")
        store.put("/other", "3")
        assert store.get("/mon/a") == "1"
        assert store.get("/missing") is None
        assert store.get_prefix("/mon/") == {"/mon/a": "1", "/mon/b": "2"}
        store.delete("/mon/a")
        assert store.get("/mon/a") is None

        got = []
        done = time.time() + 10
        wid = store.add_watch_prefix_callback(
            "/mon/", lambda wr: got.extend(
                (e.key, e.value) for e in wr.events))
        time.sleep(0.3)  # let the watch stream register server-side
        store.put("/mon/c", "9")
        store.put("/nope", "0")
        while not got and time.time() < done:
            time.sleep(0.05)
        store.cancel_watch(wid)
        assert got == [("/mon/c", "9")]
    finally:
        store.close()


def test_command_round_trip_over_real_etcd(etcd_server):
    _command_round_trip(etcd_server)
