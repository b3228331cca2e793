"""Real etcd3 integration (skip-if-unavailable): watch -> command ->
response through control.store.Etcd3Store against a live etcd server
(the reference's actual control plane, etcd_control.py:229-314).

Skips LOUDLY when the etcd3 client package or the etcd server binary is
absent (neither is bundled in the CI image); on hosts with both, this
exercises the same CommandBlock round trip the MemoryStore tests cover,
over the real wire.
"""

import json
import shutil
import subprocess
import time

import pytest

etcd3 = pytest.importorskip(
    "etcd3", reason="etcd3 client not installed — Etcd3Store untested "
                    "on this host (integration requires python-etcd3)")

ETCD_BIN = shutil.which("etcd")


@pytest.fixture
def etcd_server(tmp_path):
    if ETCD_BIN is None:
        pytest.skip("no `etcd` binary on PATH — install etcd to run "
                    "the live control-plane integration test")
    port, peer = 23791, 23801
    proc = subprocess.Popen(
        [ETCD_BIN, "--data-dir", str(tmp_path / "etcd"),
         "--listen-client-urls", f"http://127.0.0.1:{port}",
         "--advertise-client-urls", f"http://127.0.0.1:{port}",
         "--listen-peer-urls", f"http://127.0.0.1:{peer}"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    try:
        client = None
        for _ in range(50):
            try:
                client = etcd3.client(host="127.0.0.1", port=port)
                client.status()
                break
            except Exception:
                time.sleep(0.2)
        else:
            pytest.skip("etcd server failed to start")
        yield port
    finally:
        proc.terminate()
        proc.wait(timeout=10)


def test_command_round_trip_over_real_etcd(etcd_server):
    from caltech_bifrost_dsp_tpu.control.command import CommandBlock
    from caltech_bifrost_dsp_tpu.control.store import Etcd3Store

    store = Etcd3Store(host="127.0.0.1", port=etcd_server)
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
        time.sleep(0.1)
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
        time.sleep(0.1)
    else:
        pytest.fail("no response to invalid command")
