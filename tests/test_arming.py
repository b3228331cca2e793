"""Arming / integration-boundary state machine vs reference semantics
(reference: corr_block.py:392-428, corr_acc_block.py:240-292)."""

from caltech_bifrost_dsp_tpu.runtime.arming import (Action,
                                                    IntegrationController)

GULP = 10


def drive(ctrl, t0, n):
    out = []
    t = t0
    for _ in range(n):
        out.append((t, ctrl.on_gulp(t)))
        t += GULP
    return out


def test_autostart_at_zero_dumps_on_boundaries():
    ctrl = IntegrationController(GULP, acc_len=30, start_time=0)
    res = drive(ctrl, 0, 9)
    actions = [d.action for _, d in res]
    # A new output *sequence* opens only when t == start_time
    # (corr_block.py:407-417); later accumulations just roll boundaries.
    assert actions == ([Action.START, Action.ACCUMULATE, Action.DUMP]
                       + [Action.ACCUMULATE, Action.ACCUMULATE, Action.DUMP]
                       * 2)
    assert res[0][1].is_first and res[0][1].new_sequence
    assert res[3][1].is_first and not res[3][1].new_sequence
    # seq0 reports each accumulation's start spectra index
    assert res[2][1].seq0 == 0 and res[5][1].seq0 == 30


def test_start_minus_one_rounds_to_next_boundary_corr_semantics():
    # Corr: start_time=-1 -> next multiple of acc_len (corr_block.py:397-398)
    ctrl = IntegrationController(GULP, acc_len=30, start_time=None)
    ctrl.command(start_time=-1, acc_len=30)
    res = drive(ctrl, 40, 6)
    # first gulp t=40: -1 resolves to 40 - (40 % 30) + 30 = 60
    assert [d.action for _, d in res[:2]] == [Action.SKIP, Action.SKIP]
    assert res[2][0] == 60 and res[2][1].action == Action.START
    assert ctrl.start_time == 60


def test_start_minus_one_immediate_corracc_semantics():
    ctrl = IntegrationController(GULP, acc_len=30, start_time=None,
                                 recover_margin=2,
                                 next_boundary_start=False)
    ctrl.command(start_time=-1, acc_len=30)
    res = drive(ctrl, 40, 3)
    assert res[0][1].action == Action.START


def test_explicit_future_start_waits():
    ctrl = IntegrationController(GULP, acc_len=20, start_time=None)
    ctrl.command(start_time=60, acc_len=20)
    res = drive(ctrl, 0, 10)
    assert all(d.action == Action.SKIP for _, d in res[:6])
    assert all(d.state == "waiting" for _, d in res[:6])
    assert res[6][0] == 60 and res[6][1].action == Action.START
    assert res[7][1].action == Action.DUMP


def test_acc_len_zero_stops():
    ctrl = IntegrationController(GULP, acc_len=20, start_time=0)
    drive(ctrl, 0, 2)  # one full accumulation
    ctrl.command(acc_len=0, start_time=None)
    res = drive(ctrl, 20, 3)
    assert all(d.action == Action.SKIP for _, d in res)
    assert ctrl.state in ("stopped", "waiting")


def test_sequence_break_recovery_margin_10():
    ctrl = IntegrationController(GULP, acc_len=30, start_time=0,
                                 recover_margin=10)
    drive(ctrl, 0, 3)  # finishes one accumulation, started=True
    # upstream gap: new sequence starting at t=1000
    ctrl.on_sequence_start(1000)
    assert not ctrl.started
    # reference arithmetic: missed = (1000 - 0)//30 = 33;
    # new start = 0 + (33+10)*30 = 1290
    assert ctrl.start_time == 1290
    res = drive(ctrl, 1000, 40)
    started = [t for t, d in res if d.new_sequence]
    assert started == [1290]


def test_sequence_break_recovery_margin_2_corracc():
    ctrl = IntegrationController(GULP, acc_len=20, start_time=0,
                                 recover_margin=2,
                                 next_boundary_start=False)
    drive(ctrl, 0, 2)
    ctrl.on_sequence_start(100)
    # missed = 100//20 = 5 -> start = (5+2)*20 = 140
    assert ctrl.start_time == 140


def test_waiting_start_missed_state():
    ctrl = IntegrationController(GULP, acc_len=20, start_time=None)
    ctrl.command(start_time=40, acc_len=20)
    res = drive(ctrl, 50, 2)  # already past start
    assert all(d.state == "waiting_start_missed" for _, d in res)


def test_command_validation():
    ctrl = IntegrationController(GULP, acc_len=20)
    import pytest

    with pytest.raises(ValueError):
        ctrl.command(acc_len=25)
    with pytest.raises(ValueError):
        ctrl.command(start_time=15)
    ctrl.command(start_time=-1)  # allowed special value
