"""Over-the-wire receivers for the subselection and power-beam outputs.

The subselection path is the analog of the reference's
verification/test_corr_part_rx.py procedure: golden vectors -> pipeline
-> partial-correlation UDP packets -> corr_part_rx receiver ->
reference-format .dat -> EXACT equality against the golden correlation
file (channel-summed and repeat-integrated).
"""

import socket

import numpy as np

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.control.client import (CorrControlClient,
                                                    PipelineControl)
from caltech_bifrost_dsp_tpu.control.store import MemoryStore
from caltech_bifrost_dsp_tpu.io import packets as pk
from caltech_bifrost_dsp_tpu.io import sink, source
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline
from caltech_bifrost_dsp_tpu.scripts import beam_rx, corr_part_rx
from caltech_bifrost_dsp_tpu.verification import golden

CFG = cfgmod.TINY
PART_PORT = 19720
PBEAM_PORT = 19721


def _rx_socket(port):
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 64 * 1024 * 1024)
    s.bind(("127.0.0.1", port))
    return s


def _cross_pair_selection():
    """A selection that exercises real cross pairs + conjugation: every
    pol pair of every stand pair of the TINY array, cycled to fill the
    nvis_out slots (the production selection's shape does not fit a
    16-stand array)."""
    pairs = [[[s0, p0], [s1, p1]]
             for s0 in range(CFG.nstand) for s1 in range(s0, CFG.nstand)
             for p0 in range(CFG.npol) for p1 in range(CFG.npol)]
    return [pairs[i % len(pairs)] for i in range(CFG.nvis_out)]


def test_corr_part_rx_over_wire_golden(tmp_path):
    ntime = 2 * CFG.acc_len_slow
    inp = str(tmp_path / "in.dat")
    corrfile = str(tmp_path / "corr.dat")
    golden.write_input_file(inp, ntime, CFG.nchan, CFG.nstand, CFG.npol,
                            CFG.acc_len)
    golden.write_corr_file(corrfile, ntime, CFG.nchan, CFG.nstand,
                           CFG.npol, CFG.acc_len)

    rx = _rx_socket(PART_PORT)
    store = MemoryStore()
    src = source.DummySource(CFG, mode="testfile", testfile=inp)
    sub_out = sink.CorrPartOutput(
        CFG, send=sink.UdpSender("127.0.0.1", PART_PORT).__call__)
    pipe = XEnginePipeline(CFG, src, store=store,
                           subsel_outputs=[sub_out])
    cli = CorrControlClient(store=store, timeout_s=5.0)
    ctl = PipelineControl(cli, socket.gethostname(), 0)
    ctl.corr_subsel.set_baseline_select(_cross_pair_selection())

    pipe.run(ntime // CFG.ntime_gulp, timeout_s=180)
    assert pipe.ndump_fast == ntime // CFG.acc_len

    nchan_out = CFG.nchan // CFG.nchan_sum
    hdr, bls, outbuf = corr_part_rx.receive_part(
        rx, CFG.nvis_out, nchan_out, timeout_s=10.0)
    rx.close()
    assert hdr.acc_len == CFG.acc_len
    # baselines map travels on the wire and matches the commanded one
    np.testing.assert_array_equal(
        bls, np.asarray(_cross_pair_selection(), np.int32))

    fname = corr_part_rx.write_rx_file(str(tmp_path), hdr, bls, outbuf)
    n_ok, n_err = corr_part_rx.check_against_golden(corrfile, fname)
    assert n_err == 0
    assert n_ok == CFG.nvis_out


def test_beam_rx_capture_over_wire(tmp_path):
    nb2 = CFG.nbeam // 2
    rx = _rx_socket(PBEAM_PORT)
    src = source.DummySource(CFG, mode="random")
    udp = sink.UdpSender("127.0.0.1", PBEAM_PORT)
    local_pkts = []
    pb_wire = sink.PBeamOutput(
        CFG, senders={b: udp.__call__ for b in range(nb2)})
    pb_local = sink.PBeamOutput(
        CFG, senders={b: local_pkts.append for b in range(nb2)})
    pipe = XEnginePipeline(CFG, src,
                           pbeam_outputs=[pb_wire, pb_local])
    ngulp = 2 * CFG.acc_len // CFG.ntime_gulp
    pipe.run(ngulp, timeout_s=180)

    nseq = 4
    hdr, seqs, powers = beam_rx.receive_powers(
        rx, nb2, nseq, CFG.nchan, timeout_s=10.0)
    rx.close()
    assert hdr.navg == CFG.ntime_sum
    assert powers.shape == (nseq, nb2, CFG.nchan, 4)

    # cross-check against the locally captured packets
    want = {}
    for p in local_pkts:
        h, payload = pk.decode_pbeam(p)
        want[(h.beam, h.seq)] = payload[:, 0, :]
    beams = sorted({h for (h, _) in want})[:nb2]
    for si, s in enumerate(seqs):
        for bi, b in enumerate(beams):
            np.testing.assert_array_equal(powers[si, bi], want[(b, s)])

    # capture file round-trips
    fname = beam_rx.write_rx_file(str(tmp_path), hdr, seqs, powers)
    import json
    with open(fname, "rb") as fh:
        meta = json.loads(fh.readline().decode())
        data = np.frombuffer(fh.read(), np.float32).reshape(meta["shape"])
    np.testing.assert_array_equal(data, powers)
    assert meta["navg"] == CFG.ntime_sum
