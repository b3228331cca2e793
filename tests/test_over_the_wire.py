"""Full over-the-wire system test (the analog of the reference's
tests/correlator packet procedure, tests/correlator/README.md:1-54):

  golden vectors -> native snap2 blaster -> native capture -> fused
  X-engine pipeline -> COR UDP output -> receiver -> exact comparison
  against the golden correlation file.
"""

import socket
import threading

import numpy as np
import pytest

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.io import native, sink, source
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline
from caltech_bifrost_dsp_tpu.scripts import corr_rx
from caltech_bifrost_dsp_tpu.verification import golden

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

CFG = cfgmod.XEngineConfig(nstand=16, nchan=32, ntime_gulp=48, acc_len=96,
                           acc_len_slow=96, nbeam=4, ntime_sum=12,
                           npipeline=2)
RX_PORT = 19710
COR_PORT = 19711


def test_wire_end_to_end(tmp_path):
    ntime = 2 * CFG.acc_len_slow
    in_path = str(tmp_path / "in.dat")
    golden.write_input_file(in_path, ntime, CFG.nchan, CFG.nstand,
                            CFG.npol, CFG.acc_len)
    _, din = golden.read_dat(in_path)
    din = din.reshape(ntime, CFG.nchan, CFG.ninput)

    # COR receiver socket
    rx_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx_sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF,
                       8 * 1024 * 1024)
    rx_sock.bind(("127.0.0.1", COR_PORT))

    # ingest: the shared capture-source adapter (io/native.CaptureSource)
    cap_src = native.CaptureSource(CFG, "127.0.0.1", RX_PORT, nbuf=16,
                                   poll_s=20.0)

    corr_out = sink.CorrFullOutput(
        CFG, send=sink.UdpSender("127.0.0.1", COR_PORT).__call__)
    pipe = XEnginePipeline(CFG, cap_src,
                           corr_outputs=[corr_out])

    ngulp = ntime // CFG.ntime_gulp

    def blast():
        for g in range(ngulp + 2):  # +2 gulps of slack to flush the lead
            idx = min(g, ngulp - 1)
            native.transmit_gulp(
                "127.0.0.1", RX_PORT,
                np.ascontiguousarray(
                    din[idx * CFG.ntime_gulp:(idx + 1) * CFG.ntime_gulp]),
                seq0=g * CFG.ntime_gulp, nchan_per_pkt=16, npol_per_pkt=8,
                delay_ns=20000)

    tx = threading.Thread(target=blast, daemon=True)
    tx.start()
    pipe.run(ngulp, timeout_s=120)
    tx.join(timeout=30)

    # receive one full integration off the wire and compare exactly
    hdr, outbuf = corr_rx.receive_matrix(rx_sock, CFG.nstand, CFG.npol,
                                         CFG.nchan, timeout_s=10.0)
    assert hdr.acc_len == CFG.acc_len_slow
    fname = corr_rx.write_rx_file(str(tmp_path), hdr, outbuf, CFG.nstand,
                                  CFG.npol)
    # golden comparison: integrate the golden file over the slow window
    t_idx = hdr.spectra_id // CFG.acc_len
    nrep = CFG.acc_len_slow // CFG.acc_len
    blocks = list(golden.generate_input_blocks(
        ntime, CFG.nchan, CFG.nstand, CFG.npol, CFG.acc_len))
    want = sum(golden.reference_correlation(blocks[t_idx + i])
               for i in range(nrep))
    got = outbuf.transpose(4, 0, 1, 2, 3)  # [chan, s0, s1, p0, p1]
    np.testing.assert_array_equal(got, want)
    rx_sock.close()
    cap_src.close()
