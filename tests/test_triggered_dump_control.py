"""TriggeredDump over the control path: run a pipeline with a deep
history buffer, trigger a dump by command, replay the file."""

import glob
import time

import numpy as np

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.control.client import (CorrControlClient,
                                                    PipelineControl)
from caltech_bifrost_dsp_tpu.control.store import MemoryStore
from caltech_bifrost_dsp_tpu.io import source
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline

CFG = cfgmod.TINY


def test_trigger_dump_via_control(tmp_path):
    store = MemoryStore()
    src = source.DummySource(CFG, mode="ramp")
    pipe = XEnginePipeline(CFG, src, store=store,
                           history_nbyte=16 * CFG.gulp_nbyte)
    ngulp = 12
    pipe.run(ngulp, timeout_s=180)
    cli = CorrControlClient(store=store, timeout_s=5.0)
    ctl = PipelineControl(cli, __import__("socket").gethostname(), 0)
    ctl.triggered_dump.trigger(ntime_per_file=CFG.ntime_gulp, nfile=2,
                               dump_path=str(tmp_path))
    for _ in range(100):
        files = sorted(glob.glob(str(tmp_path / "*.tbf")))
        if len(files) == 2 and pipe.dump_cmd.stats.get("state") == "idle":
            break
        time.sleep(0.05)
    assert len(files) == 2
    # replay and verify contents against the ramp source
    replay = source.TriggerFileSource(files[0])
    hdr, data = replay.read()
    assert hdr["ntime"] == CFG.ntime_gulp
    # history kept all 12 gulps (capacity 16) -> first file = gulp 0
    want = source.DummySource(CFG, mode="ramp").gulp(0)
    np.testing.assert_array_equal(
        data.reshape(CFG.ntime_gulp, CFG.nchan, CFG.ninput), want)
    # replay gulps advance seq by ntime_gulp
    seqs = [s for s, _ in replay.gulps(CFG.ntime_gulp)]
    assert seqs == [hdr["seq0"]]
