"""Network KV store: the etcd-less multi-process control backend."""

import json
import time

from caltech_bifrost_dsp_tpu.control.client import CorrControlClient
from caltech_bifrost_dsp_tpu.control.command import CommandBlock
from caltech_bifrost_dsp_tpu.control.netstore import NetStore, StoreServer


def test_kv_roundtrip_and_prefix():
    srv = StoreServer(port=0)
    cli = NetStore(port=srv.port)
    cli.put("/a/b", "1")
    cli.put("/a/c", "2")
    cli.put("/x", "3")
    assert cli.get("/a/b") == "1"
    assert cli.get("/missing") is None
    assert cli.get_prefix("/a") == {"/a/b": "1", "/a/c": "2"}
    cli.delete("/a/b")
    assert cli.get("/a/b") is None
    cli.close()
    srv.close()


def test_watch_callbacks_across_clients():
    srv = StoreServer(port=0)
    a = NetStore(port=srv.port)
    b = NetStore(port=srv.port)
    got = []
    wid = a.add_watch_prefix_callback("/cmd", lambda wr: got.extend(
        (e.key, e.value) for e in wr.events))
    b.put("/cmd/x", "hello")
    b.put("/other", "nope")
    b.put("/cmd/y", "world")
    deadline = time.time() + 5
    while len(got) < 2 and time.time() < deadline:
        time.sleep(0.01)
    assert got == [("/cmd/x", "hello"), ("/cmd/y", "world")]
    a.cancel_watch(wid)
    a.close()
    b.close()
    srv.close()


def test_command_block_over_network_store():
    """Full control round-trip with the block and the client in the same
    process but talking only through the TCP store (the multi-process
    topology)."""
    srv = StoreServer(port=0)
    block_store = NetStore(port=srv.port)
    client_store = NetStore(port=srv.port)
    blk = CommandBlock("Corr", store=block_store, host="nethost")
    blk.define_command_key("acc_len", type=int, initial_val=2400,
                           condition=lambda x: x % 480 == 0)
    cli = CorrControlClient(store=client_store, timeout_s=5.0)
    resp = cli.send_command("nethost", 0, "Corr", blk.instance_id,
                            acc_len=4800)
    assert resp["status"] == "normal"
    blk.update_command_vals()
    assert blk.command_vals["acc_len"] == 4800
    blk.close()
    block_store.close()
    client_store.close()
    srv.close()
