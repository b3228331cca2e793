"""Runtime output-destination control (dest_ip/dest_file/max_mbps)."""

import numpy as np

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.control.client import (CorrControlClient,
                                                    PipelineControl)
from caltech_bifrost_dsp_tpu.control.store import MemoryStore
from caltech_bifrost_dsp_tpu.io import packets as pk
from caltech_bifrost_dsp_tpu.io import sink, source
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline

CFG = cfgmod.TINY


def test_dest_file_redirect(tmp_path):
    """Route slow-corr packets to a file via the control plane (the
    DiskWriter analog, corr_output_full_block.py dest_file key)."""
    store = MemoryStore()
    src = source.DummySource(CFG, mode="random")
    corr_out = sink.CorrFullOutput(CFG, send=None)
    pipe = XEnginePipeline(CFG, src, store=store,
                           corr_outputs=[corr_out])
    cli = CorrControlClient(store=store, timeout_s=5.0)
    ctl = PipelineControl(cli, __import__("socket").gethostname(), 0)
    outfile = str(tmp_path / "cor.dat")
    ctl.corr_output_full.set_dest_file(outfile)
    ngulp = 2 * CFG.acc_len_slow // CFG.ntime_gulp
    pipe.run(ngulp, timeout_s=180)
    assert pipe.ndump_slow == 2
    # the file holds back-to-back COR packets; parse the first
    raw = open(outfile, "rb").read()
    nbl = CFG.nstand * (CFG.nstand + 1) // 2
    pkt_size = 56 + CFG.npol * CFG.npol * CFG.nchan * 2 * 4
    assert len(raw) == 2 * nbl * pkt_size
    hdr, data = pk.decode_corr_full(raw[:pkt_size])
    assert hdr.stand0 == 0 and hdr.stand1 == 0
    assert hdr.acc_len == CFG.acc_len_slow


def test_baseline_select_roundtrip_via_special_key():
    from caltech_bifrost_dsp_tpu.control.monitor import MonitorBridge
    from caltech_bifrost_dsp_tpu.ops import corr_subsel as cs

    store = MemoryStore()
    src = source.DummySource(CFG, mode="random")
    pipe = XEnginePipeline(CFG, src, store=store)
    cli = CorrControlClient(store=store, timeout_s=5.0)
    ctl = PipelineControl(cli, __import__("socket").gethostname(), 0)
    new_bl = cs.default_baselines(CFG.nvis_out, CFG.nstand)
    new_bl[0] = [[1, 1], [2, 0]]
    ctl.corr_subsel.set_baseline_select(new_bl)
    pipe.run(CFG.acc_len // CFG.ntime_gulp, timeout_s=180)
    MonitorBridge(store, host=ctl.corr_subsel._host
                  if hasattr(ctl.corr_subsel, "_host") else None,
                  pipeline_id=0).publish_once()
    got = ctl.corr_subsel.get_baseline_select()
    assert got == new_bl


def test_per_beam_destination_lists():
    """BeamformOutput per-beam dest lists rebuild the senders map."""
    store = MemoryStore()
    src = source.DummySource(CFG, mode="random")
    pb = sink.PBeamOutput(CFG, senders={})
    pipe = XEnginePipeline(CFG, src, store=store, pbeam_outputs=[pb])
    cli = CorrControlClient(store=store, timeout_s=5.0)
    ctl = PipelineControl(cli, __import__("socket").gethostname(), 0)
    nb2 = CFG.nbeam // 2
    ips = ["127.0.0.1"] + ["0.0.0.0"] * (nb2 - 1)
    ctl.beamform_output.set_destinations(ips, [19999] * nb2)
    pipe.run(CFG.acc_len // CFG.ntime_gulp, timeout_s=180)
    assert set(pb.senders) == {0}  # only beam 0 enabled


def test_disable_with_zero_ip():
    store = MemoryStore()
    src = source.DummySource(CFG, mode="random")
    pkts = []
    corr_out = sink.CorrFullOutput(CFG, send=pkts.append)
    pipe = XEnginePipeline(CFG, src, store=store,
                          corr_outputs=[corr_out])
    cli = CorrControlClient(store=store, timeout_s=5.0)
    ctl = PipelineControl(cli, __import__("socket").gethostname(), 0)
    ctl.corr_output_full.set_destination("0.0.0.0", 1)
    pipe.run(CFG.acc_len_slow // CFG.ntime_gulp, timeout_s=180)
    assert pipe.ndump_slow == 1
    assert pkts == []  # emission disabled


def test_write_autos_control(tmp_path):
    """The write_autos control key (documented but unwired in the
    reference, corr_output_full_control.py:83-87) dumps per-stand
    autocorrelation spectra per slow dump here."""
    import numpy as np

    from caltech_bifrost_dsp_tpu import config as cfgmod
    from caltech_bifrost_dsp_tpu.control.store import MemoryStore
    from caltech_bifrost_dsp_tpu.io import sink
    from caltech_bifrost_dsp_tpu.runtime.driver import OutputCommandBlock

    cfg = cfgmod.TINY
    store = MemoryStore()
    pkts = []
    out = sink.CorrFullOutput(cfg, send=pkts.append)
    blk = OutputCommandBlock("CorrOutputFull", out, store=store)
    import json

    store.put(blk.command_key, json.dumps(
        {"id": "1", "cmd": "update",
         "val": {"kwargs": {"write_autos": str(tmp_path)}}}))
    blk.apply_pending()
    assert out.autos_path == str(tmp_path)
    rng = np.random.RandomState(0)
    nin = cfg.ninput
    v = rng.randint(-5, 5, [5, cfg.nchan, nin]) \
        + 1j * rng.randint(-5, 5, [5, cfg.nchan, nin])
    dense = np.einsum("tci,tcj->cij", v, v.conj())
    out.send_matrix(dense, sync_time=0, spectra_id=480, acc_len=480)
    autos = np.load(tmp_path / "autos_480.npy")
    assert autos.shape == (cfg.nstand, cfg.npol, cfg.nchan)
    want = np.real(dense[:, 0, 0])
    np.testing.assert_allclose(autos[0, 0], want)
    assert (autos >= 0).all()  # autocorrelations are non-negative


def test_dest_file_retarget_closes_previous_handle(tmp_path):
    """Repeated dest_file retargets must not accumulate open fds
    (each retarget closes the prior handle)."""
    import json

    from caltech_bifrost_dsp_tpu.runtime.driver import OutputCommandBlock

    store = MemoryStore()
    out = sink.CorrFullOutput(CFG, send=None)
    blk = OutputCommandBlock("CorrOutputFull", out, store=store)
    handles = []
    for i in range(4):
        store.put(blk.command_key, json.dumps(
            {"id": str(i), "cmd": "update",
             "val": {"kwargs": {"dest_file": str(tmp_path / f"o{i}.dat")}}}))
        blk.apply_pending()
        assert blk._dest_fh is not None and not blk._dest_fh.closed
        handles.append(blk._dest_fh)
    # every handle but the live one is closed
    assert [fh.closed for fh in handles] == [True, True, True, False]
    out.send(b"x")
    # disabling releases the last handle too
    store.put(blk.command_key, json.dumps(
        {"id": "z", "cmd": "update",
         "val": {"kwargs": {"dest_file": "", "dest_ip": "0.0.0.0"}}}))
    blk.apply_pending()
    assert handles[-1].closed
    assert out.send is None
    assert (tmp_path / "o3.dat").read_bytes() == b"x"
