"""Control-plane protocol tests (command envelope, validation codes,
staging, response round-trip, simulated mode, monitoring bridge)."""

import json

import pytest

from caltech_bifrost_dsp_tpu.control import client as ctl
from caltech_bifrost_dsp_tpu.control.command import (COMMAND_INVALID,
                                                     COMMAND_NOT_RECOGNIZED,
                                                     COMMAND_OK,
                                                     COMMAND_WRONG_TYPE,
                                                     CommandBlock)
from caltech_bifrost_dsp_tpu.control.monitor import MonitorBridge, render_text
from caltech_bifrost_dsp_tpu.control.store import MemoryStore


@pytest.fixture
def store():
    return MemoryStore()


def make_block(store, **kw):
    blk = CommandBlock("Corr", store=store, host="testhost", **kw)
    blk.define_command_key("acc_len", type=int, initial_val=2400,
                           condition=lambda x: x % 480 == 0)
    blk.define_command_key("start_time", type=int, initial_val=0,
                           condition=lambda x: x == -1 or x % 480 == 0)
    return blk


def test_command_roundtrip_and_staging(store):
    blk = make_block(store)
    cli = ctl.CorrControlClient(store=store, timeout_s=2.0)
    resp = cli.send_command("testhost", 0, "Corr", blk.instance_id,
                            acc_len=4800)
    assert resp["status"] == "normal"
    # staged, not applied
    assert blk.command_vals["acc_len"] == 2400
    assert blk.update_pending
    blk.update_command_vals()
    assert blk.command_vals["acc_len"] == 4800
    assert not blk.update_pending


def test_rejection_codes(store):
    blk = make_block(store)
    codes = []
    # unknown key -> -1; wrong type -> -2; failed condition -> -3
    for kwargs in ({"nope": 1}, {"acc_len": "x"}, {"acc_len": 7}):
        blk.process_command_strings(json.dumps(
            {"cmd": "update", "id": "1", "val": {"kwargs": kwargs}}))
        codes.append(blk.stats["last_cmd_response"])
    assert codes == [COMMAND_NOT_RECOGNIZED, COMMAND_WRONG_TYPE,
                     COMMAND_INVALID]
    blk.process_command_strings(json.dumps(
        {"cmd": "update", "id": "1", "val": {"kwargs": {"acc_len": 960}}}))
    assert blk.stats["last_cmd_response"] == COMMAND_OK


def test_malformed_envelopes_get_error_responses(store):
    blk = make_block(store)
    for bad in ("not json",
                json.dumps({"cmd": "update"}),               # missing id
                json.dumps({"cmd": "bogus", "id": "1"}),     # bad cmd
                json.dumps({"cmd": "update", "id": "1", "val": 3}),
                json.dumps({"cmd": "update", "id": "1",
                            "val": {"kwargs": 3}})):
        blk.process_command_strings(bad)
        resp = json.loads(store.get(blk.response_key))
        assert resp["val"]["status"] == "error"


def test_client_raises_on_rejicted_command(store):
    blk = make_block(store)
    cli = ctl.CorrControlClient(store=store, timeout_s=2.0)
    with pytest.raises(RuntimeError):
        cli.send_command("testhost", 0, "Corr", blk.instance_id, acc_len=7)


def test_simulated_mode_matches_reference_shape():
    cli = ctl.CorrControlClient(simulated=True)
    raw = cli.send_command("h", 0, "Corr", 0, start_time=-1)
    cmd = json.loads(raw)
    assert cmd["cmd"] == "update"
    assert cmd["val"]["kwargs"] == {"start_time": -1}
    # and it can be injected straight into a block (the etcd-bypass path)
    blk = make_block(MemoryStore())
    blk.process_command_strings(raw)
    blk.update_command_vals()
    assert blk.command_vals["start_time"] == -1


def test_apply_immediately_mode(store):
    blk = make_block(store, apply_immediately=True)
    cli = ctl.CorrControlClient(store=store, timeout_s=2.0)
    cli.send_command("testhost", 0, "Corr", blk.instance_id, acc_len=9600)
    assert blk.command_vals["acc_len"] == 9600  # no staging


def test_corrcontrol_handle(store):
    blk = make_block(store)
    cli = ctl.CorrControlClient(store=store, timeout_s=2.0)
    corr = ctl.CorrControl(cli, "testhost", 0, "Corr",
                           instance_id=blk.instance_id)
    corr.set_acc_length(4800)
    blk.update_command_vals()
    assert blk.command_vals["acc_len"] == 4800
    with pytest.raises(AssertionError):
        corr.set_acc_length(2400.0)  # non-int rejected client-side


def test_arm_path_via_monitor_status(store):
    """get_next_allowed_start reads sync_time/bw_hz/nchan/xgpu_acc_len
    off the published status (the full arm arithmetic round trip)."""
    blk = make_block(store)
    blk.sequence_proclog.update({"sync_time": 1000.0,
                                 "bw_hz": 192 * 23925.78125,
                                 "nchan": 192, "seq0": 0})
    blk.update_stats({"state": "running", "curr_sample": 0,
                      "xgpu_acc_len": 480})
    MonitorBridge(store, host="testhost").publish_once()
    cli = ctl.CorrControlClient(store=store, timeout_s=2.0)
    corr = ctl.CorrControl(cli, "testhost", 0, "Corr",
                           instance_id=blk.instance_id)
    start = corr.get_next_allowed_start(5.0)
    assert start % 480 == 0  # rounded to the commandable granularity
    assert start > 0


def test_monitor_bridge_and_dashboard(store):
    blk = make_block(store)
    blk.update_stats({"state": "running", "ngood_bytes": 0})
    bridge = MonitorBridge(store, host="testhost")
    bridge.publish_once()
    blk.update_stats({"ngood_bytes": 10_000_000})
    # fake elapsed time for rate derivation
    for k in bridge._prev_bytes:
        t, n = bridge._prev_bytes[k]
        bridge._prev_bytes[k] = (t - 1.0, n)
    out = bridge.publish_once()
    (key, payload), = [(k, v) for k, v in out.items() if "Corr" in k]
    assert payload["gbps"] > 0
    txt = render_text(store)
    assert "state=running" in txt


def test_arm_and_wait_three_pipelines_with_skew(store):
    """Arm >2 pipelines whose published clocks are deliberately skewed:
    the commanded start must be COMMON, aligned, and in the future for
    every pipeline (max over per-pipeline next-allowed starts), and the
    two-phase waiting->running verification must pass (reference:
    _arm_and_wait, lwa352_pipeline_control.py:165-207)."""
    import threading
    import time as _time

    def publish(pid, state):
        # one status key per pipeline, as each pipeline's own monitor
        # bridge would publish it (the in-process proclog registry is
        # per-process, so emulate the three processes directly)
        store.put(
            f"/mon/corr/x/testhost/pipeline/{pid}/Corr/0/status",
            json.dumps({"sync_time": 1000.0 - 2.0 * pid,
                        "bw_hz": 192 * 23925.78125, "nchan": 192,
                        "stats": {"state": state,
                                  "xgpu_acc_len": 480}}))

    blks = []
    for pid in range(3):
        CommandBlock.set_id(pid)
        CommandBlock.reset_instance_counts()
        blk = CommandBlock("Corr", store=store, host="testhost")
        blk.define_command_key("acc_len", type=int, initial_val=2400,
                               condition=lambda x: x % 480 == 0)
        blk.define_command_key(
            "start_time", type=int, initial_val=0,
            condition=lambda x: x == -1 or x % 480 == 0)
        publish(pid, "running")
        blks.append(blk)
    CommandBlock.set_id(0)

    cli = ctl.CorrControlClient(store=store, timeout_s=2.0)
    pls = [ctl.PipelineControl(cli, "testhost", pid) for pid in range(3)]
    corr = ctl.CorrelatorControl(cli, pls)

    expected = [p.corr.get_next_allowed_start(5.0) for p in pls]
    assert len(set(expected)) > 1  # the skew is real

    # emulate each pipeline's compute loop: apply staged commands, walk
    # waiting -> running
    stop = _time.time() + 10

    def run_block(pid, blk):
        armed = False
        while _time.time() < stop:
            if blk.update_pending:
                blk.update_command_vals()
                armed = True
                publish(pid, "waiting")
            elif armed:
                publish(pid, "running")
                return
            _time.sleep(0.02)

    threads = [threading.Thread(target=run_block, args=(pid, b))
               for pid, b in enumerate(blks)]
    for t in threads:
        t.start()
    start = corr.arm_and_wait(delay_s=5.0, timeout_s=10.0)
    for t in threads:
        t.join()

    # arm_and_wait recomputes next-allowed starts at its own (slightly
    # later) time.time(), so the commanded start may land a few 20 ms
    # grid slots past our pre-computed bound on a loaded machine; it
    # must never be EARLIER, and 2 s of scheduling slack is generous.
    assert start >= max(expected)      # furthest-ahead pipeline bounds it
    assert start - max(expected) <= 480 * 100  # <= ~2 s of slot drift
    assert start % 480 == 0
    for blk, exp in zip(blks, expected):
        assert blk.command_vals["start_time"] == start
        assert start >= exp            # in the future for EVERY pipeline


def test_arm_and_wait_rejects_unarmed_running_pipeline(store):
    """A pipeline that acks the arm command but never APPLIES it stays
    'running' on its old accumulation grid; once wall time passes the
    commanded start it must still FAIL verification (review finding:
    a stale 'running' with curr_sample past start previously satisfied
    both phases without any proof the arm took effect)."""
    CommandBlock.set_id(0)
    CommandBlock.reset_instance_counts()
    blk = CommandBlock("Corr", store=store, host="testhost")
    blk.define_command_key("acc_len", type=int, initial_val=2400)
    blk.define_command_key(
        "start_time", type=int, initial_val=0,
        condition=lambda x: x == -1 or x % 480 == 0)
    # published status: running, stream far past any commandable start,
    # but the applied start_time is the STALE pre-arm value
    store.put(
        "/mon/corr/x/testhost/pipeline/0/Corr/0/status",
        json.dumps({"sync_time": 1000.0, "bw_hz": 192 * 23925.78125,
                    "nchan": 192,
                    "stats": {"state": "running", "xgpu_acc_len": 480,
                              "curr_sample": 10**15,
                              "start_time": 0,
                              "new_start_time": 0}}))
    cli = ctl.CorrControlClient(store=store, timeout_s=2.0)
    pls = [ctl.PipelineControl(cli, "testhost", 0)]
    corr = ctl.CorrelatorControl(cli, pls)
    with pytest.raises(ctl.CommandTimeout):
        corr.arm_and_wait(delay_s=5.0, timeout_s=2.0)


def test_arm_and_wait_immediate_deadline_raises_timeout(store):
    """timeout_s=0 must raise CommandTimeout, not NameError (the
    timeout message references the last-polled states, which do not
    exist when the deadline expires before the first poll)."""
    CommandBlock.set_id(0)
    CommandBlock.reset_instance_counts()
    blk = CommandBlock("Corr", store=store, host="testhost")
    blk.define_command_key("acc_len", type=int, initial_val=2400)
    blk.define_command_key(
        "start_time", type=int, initial_val=0,
        condition=lambda x: x == -1 or x % 480 == 0)
    store.put(
        "/mon/corr/x/testhost/pipeline/0/Corr/0/status",
        json.dumps({"sync_time": 1000.0, "bw_hz": 192 * 23925.78125,
                    "nchan": 192,
                    "stats": {"state": "running",
                              "xgpu_acc_len": 480}}))
    cli = ctl.CorrControlClient(store=store, timeout_s=2.0)
    corr = ctl.CorrelatorControl(
        cli, [ctl.PipelineControl(cli, "testhost", 0)])
    with pytest.raises(ctl.CommandTimeout):
        corr.arm_and_wait(delay_s=5.0, timeout_s=0.0)


def test_render_text_skips_subkeys(store):
    """The cached baselines sub-key (a bare JSON list) must not break
    the dashboard (regression: examples/demo.py crashed on it)."""
    blk = make_block(store)
    blk.update_stats({"state": "running",
                      "baselines": [[[0, 0], [0, 0]]] * 4})
    bridge = MonitorBridge(store, host="testhost")
    bridge.publish_once()
    keys = store.get_prefix("/mon/corr")
    assert any(k.endswith("/baselines") for k in keys)  # sub-key exists
    out = render_text(store)
    assert "Corr" in out


def test_rejected_command_stages_nothing(store):
    """A command rejected on any key must not take effect at all — the
    reference documents its own partial staging as undefined
    (block_base.py:305-307); this implementation validates the whole
    command before staging."""
    blk = make_block(store)
    blk.process_command_strings(json.dumps(
        {"cmd": "update", "id": "1",
         "val": {"kwargs": {"acc_len": 4800, "nope": 1}}}))
    assert blk.stats["last_cmd_response"] == COMMAND_NOT_RECOGNIZED
    # a later accepted command must not drag the rejected acc_len along
    blk.process_command_strings(json.dumps(
        {"cmd": "update", "id": "2",
         "val": {"kwargs": {"start_time": 960}}}))
    blk.update_command_vals()
    assert blk.command_vals["acc_len"] == 2400
    assert blk.command_vals["start_time"] == 960


def test_immediate_mode_callback_sees_only_new_keys(store):
    """The apply hook receives the delta of the accepted command, not
    the cumulative pending dict — one-shot keys (TriggeredDump
    "command": "trigger") must not re-fire on later unrelated
    commands, and a rejected command must not fire the hook."""
    blk = CommandBlock("Dump", store=store, host="testhost",
                       apply_immediately=True)
    blk.define_command_key("command", type=str, initial_val="",
                           condition=lambda x: x in ("", "trigger"))
    blk.define_command_key("nfile", type=int, initial_val=1)
    seen = []
    blk._on_command_applied = seen.append
    blk.process_command_strings(json.dumps(
        {"cmd": "update", "id": "1",
         "val": {"kwargs": {"command": "trigger"}}}))
    blk.process_command_strings(json.dumps(
        {"cmd": "update", "id": "2", "val": {"kwargs": {"nfile": 3}}}))
    blk.process_command_strings(json.dumps(  # rejected: wrong type
        {"cmd": "update", "id": "3", "val": {"kwargs": {"nfile": "x"}}}))
    assert seen == [{"command": "trigger"}, {"nfile": 3}]
    assert blk.command_vals["command"] == "trigger"
    assert blk.command_vals["nfile"] == 3
