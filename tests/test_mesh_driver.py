"""The threaded pipeline driver running sharded over the 8-device
virtual mesh, gated by the same golden-vector equality as single-device.
"""

import jax
import numpy as np
import pytest

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.io import sink, source
from caltech_bifrost_dsp_tpu.parallel import mesh as pmesh
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline
from caltech_bifrost_dsp_tpu.verification import golden

# mesh-compatible operating point: nchan divides the chan axis with
# nchan_sum-aligned shards; per-(gulp, time-shard) spectra divide
# ntime_sum
CFG = cfgmod.XEngineConfig(nstand=8, nchan=32, ntime_gulp=48, acc_len=96,
                           acc_len_slow=192, nbeam=4, ntime_sum=12,
                           nchan_sum=4, npipeline=2)


def test_pipeline_on_mesh_golden(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("need 8 virtual devices")
    mesh = pmesh.make_mesh(2, 4)
    ntime = 2 * CFG.acc_len_slow
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
                           subsel_outputs=[sub_out], mesh=mesh)
    pipe.run(ntime // CFG.ntime_gulp, timeout_s=300)
    assert pipe.ndump_fast == ntime // CFG.acc_len
    assert pipe.ndump_slow == 2
    assert corr_out.check_count == 2 and corr_out.check_failures == 0
    assert sub_pkts


def test_mesh_vlbi_output_flows():
    """VLBI voltages gather over the chan axis and stream in mesh mode."""
    mesh = pmesh.make_mesh(2, 4)
    src = source.DummySource(CFG, mode="random")
    pkts = []
    ib = sink.IBeamOutput(CFG, send=pkts.append)
    pipe = XEnginePipeline(CFG, src, mesh=mesh, ibeam_outputs=[ib])
    pipe.run(CFG.acc_len // CFG.ntime_gulp, timeout_s=300)
    assert len(pkts) == CFG.acc_len  # one packet per time sample
    from caltech_bifrost_dsp_tpu.io import packets as pk

    hdr, data = pk.decode_ibeam(pkts[0])
    assert hdr.nchan == CFG.nchan and data.shape == (CFG.nchan, 2, 2)


FX_CFG = cfgmod.XEngineConfig(nstand=8, nchan=32, ntime_gulp=48,
                              acc_len=96, acc_len_slow=192, nbeam=4,
                              ntime_sum=12, nchan_sum=4, npipeline=2,
                              pfb_ntap=4)


def _run_fx(mesh, cfg=None):
    cfg = cfg or FX_CFG
    src = source.ADCSource(cfg, mode="tone", tone_chan=9,
                           amplitude=5.0)
    slow_dumps, sub_pkts, ib_pkts = [], [], []

    class Grab:
        checkfile = None

        def send_matrix(self, dense, *a, **k):
            slow_dumps.append(np.array(dense))
            return 0

    sub = sink.CorrPartOutput(cfg, send=sub_pkts.append)
    ib = sink.IBeamOutput(cfg, send=ib_pkts.append)
    pipe = XEnginePipeline(cfg, src, corr_outputs=[Grab()],
                           subsel_outputs=[sub], ibeam_outputs=[ib],
                           quant_scale=1.0, fx_mode=True, mesh=mesh)
    ngulp = 2 * cfg.acc_len_slow // cfg.ntime_gulp
    pipe.run(ngulp, timeout_s=300)
    return pipe, slow_dumps, sub_pkts, ib_pkts


def test_fx_pipeline_sharded_matches_single_device():
    """The flagship composition: FX (north-star) mode running sharded in
    the real streaming driver — PFB halo via on-mesh ppermute, F->X
    corner-turn, accumulating X/B — must emit bitwise-identical products
    to the single-device FX driver (VERDICT r1 item 3)."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 virtual devices")
    mesh = pmesh.make_mesh(2, 4)
    pipe_s, slow_s, sub_s, ib_s = _run_fx(None)
    pipe_m, slow_m, sub_m, ib_m = _run_fx(mesh)
    assert pipe_s.ndump_slow == pipe_m.ndump_slow == 2
    assert len(slow_s) == len(slow_m)
    for a, b in zip(slow_s, slow_m):
        np.testing.assert_array_equal(a, b)
    assert len(sub_s) == len(sub_m) and sub_s == sub_m
    assert len(ib_s) == len(ib_m) and ib_s == ib_m
    # tone sanity on the sharded run
    autos = np.real(slow_m[-1][:, 0, 0])
    assert autos.argmax() == 9


def test_fx_pipeline_sharded_pallas_engine_matches_single_device():
    """The full Pallas engine set (channelizer + subsel gather) under
    the sharded driver: packed corner-turn + halo must still be
    bitwise-identical to the single-device Pallas FX driver."""
    if len(jax.devices()) < 8:
        pytest.skip("need 8 virtual devices")
    cfg = FX_CFG.replace(pfb_fft_impl="matmul", pfb_engine="pallas",
                         subsel_engine="pallas")
    mesh = pmesh.make_mesh(2, 4)
    pipe_s, slow_s, sub_s, ib_s = _run_fx(None, cfg)
    pipe_m, slow_m, sub_m, ib_m = _run_fx(mesh, cfg)
    assert pipe_s.ndump_slow == pipe_m.ndump_slow == 2
    for a, b in zip(slow_s, slow_m):
        np.testing.assert_array_equal(a, b)
    assert sub_s == sub_m and ib_s == ib_m
    autos = np.real(slow_m[-1][:, 0, 0])
    assert autos.argmax() == 9
