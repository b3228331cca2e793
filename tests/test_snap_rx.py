"""snap2 sniffer / rate validator (parity: test_receivers/snap_rx.py +
test_eth_rx.py): header dump, rate accounting, per-source sequence-gap
and out-of-order counters."""

import io
import socket

import numpy as np

from caltech_bifrost_dsp_tpu.io import packets as pk
from caltech_bifrost_dsp_tpu.scripts import snap_rx

PORT = 19760


def _pair(port):
    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", port))
    rx.settimeout(2.0)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    return rx, tx


def _pkt(seq, chan_block=0, pol0=0, nchan=8, npol=4):
    hdr = pk.Snap2Header(seq=seq, npol=npol, npol_tot=npol, nchan=nchan,
                         nchan_tot=nchan, chan_block_id=chan_block,
                         chan0=chan_block * nchan, pol0=pol0)
    payload = np.full((nchan, npol), 0x21, np.uint8)
    return pk.encode_snap2(hdr, payload)


def test_rate_stats_counts_gaps_and_ooo():
    rx, tx = _pair(PORT)
    dst = ("127.0.0.1", PORT)
    # two sources; source (0,0): seqs 0,1,3 (one gap), then 3 again
    # (one duplicate); source (1,4): clean 0,1,2
    for seq in (0, 1, 3, 3):
        tx.sendto(_pkt(seq, 0, 0), dst)
    for seq in (0, 1, 2):
        tx.sendto(_pkt(seq, 1, 4), dst)
    s = snap_rx.rate_stats(rx, seconds=1.0, report_s=10.0,
                           out=io.StringIO())
    rx.close()
    tx.close()
    assert s["npkt"] == 7
    assert s["nsrc"] == 2
    assert s["ngap"] == 1
    assert s["nooo"] == 1
    assert s["gbps"] > 0


def test_sniff_prints_headers_and_payload():
    rx, tx = _pair(PORT + 1)
    dst = ("127.0.0.1", PORT + 1)
    tx.sendto(_pkt(5), dst)
    out = io.StringIO()
    n = snap_rx.sniff(rx, 1, show_data=True, out=out)
    rx.close()
    tx.close()
    assert n == 1
    text = out.getvalue()
    assert "seq=5" in text
    # payload byte 0x21 unpacks to 2 + 1j with the 4+4-bit convention
    assert "2.+1.j" in text


def test_cli_stats_mode_exit_codes():
    # clean stream -> exit 0; stream with a gap -> exit 1
    for seqs, want in (((0, 1, 2), 0), ((0, 2), 1)):
        rx_port = PORT + 2
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        import threading

        def blast():
            import time
            time.sleep(0.2)
            for seq in seqs:
                tx.sendto(_pkt(seq), ("127.0.0.1", rx_port))

        th = threading.Thread(target=blast, daemon=True)
        th.start()
        rc = snap_rx.main(["--ip", "127.0.0.1", "-P", str(rx_port),
                           "-t", "1.0"])
        th.join()
        tx.close()
        assert rc == want, (seqs, rc)
