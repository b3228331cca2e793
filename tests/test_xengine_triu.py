"""Fused step + driver with the Pallas triangular correlator engine
(interpret mode on CPU): golden equality end-to-end."""

import numpy as np
import pytest

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.io import sink, source
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline
from caltech_bifrost_dsp_tpu.verification import golden

CFG = cfgmod.TINY.replace(corr_engine="pallas_triu")


def test_pipeline_golden_with_triu_engine(tmp_path):
    ntime = CFG.acc_len_slow
    inp = str(tmp_path / "in.dat")
    corrfile = str(tmp_path / "corr.dat")
    golden.write_input_file(inp, ntime, CFG.nchan, CFG.nstand, CFG.npol,
                            CFG.acc_len)
    golden.write_corr_file(corrfile, ntime, CFG.nchan, CFG.nstand,
                           CFG.npol, CFG.acc_len)
    src = source.DummySource(CFG, mode="testfile", testfile=inp)
    sub_pkts = []
    corr_out = sink.CorrFullOutput(CFG, checkfile=corrfile,
                                   checkfile_acc_len=CFG.acc_len)
    sub_out = sink.CorrPartOutput(CFG, send=sub_pkts.append)
    pipe = XEnginePipeline(CFG, src, corr_outputs=[corr_out],
                           subsel_outputs=[sub_out], selftest=True)
    pipe.run(ntime // CFG.ntime_gulp, timeout_s=300)
    assert pipe.ndump_slow == 1
    assert corr_out.check_count == 1 and corr_out.check_failures == 0
    assert pipe.selftest_failures == 0 and pipe.selftest_count == 2
    assert sub_pkts  # subselection flowed from the triangular layout


def test_subsel_conjugated_gather_on_triu():
    """Selections whose first input index exceeds the second must come
    back conjugated from the upper-triangle store."""
    import jax.numpy as jnp

    from caltech_bifrost_dsp_tpu.models import xengine
    from caltech_bifrost_dsp_tpu.ops import corr_subsel as cs

    state, packed, gains, _ = xengine.default_inputs(CFG)
    baselines = [[[5, 1], [2, 0]],   # input 11 x conj(input 4): swapped
                 [[2, 0], [5, 1]],   # input 4 x conj(input 11): natural
                 [[3, 0], [3, 0]]]   # auto
    pairs = jnp.asarray(cs.baselines_to_inputs(baselines).astype(np.int32))
    state, out = xengine.xengine_step_jit(state, packed, gains, pairs,
                                          True, True, True, CFG)
    got = (np.asarray(out.subsel.real).astype(np.int64)
           + 1j * np.asarray(out.subsel.imag))
    dense = xengine.dense_vis(state.vis_fast, CFG)
    v = (np.asarray(dense.real).astype(np.int64)
         + 1j * np.asarray(dense.imag))
    for k, ((s0, p0), (s1, p1)) in enumerate(baselines):
        i0 = 2 * s0 + p0
        i1 = 2 * s1 + p1
        want = v[:, i0, i1].reshape(-1, CFG.nchan_sum).sum(axis=1)
        np.testing.assert_array_equal(got[:, k], want)
