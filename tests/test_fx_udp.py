"""FX mode over real UDP ADC ingest: int8 digitizer frames -> native
capture -> staging ring -> PFB -> X/B, end-to-end over a loopback
socket.  The dump must be byte-identical to the same ADC samples fed
through the in-process ADCSource (the capture path adds nothing and
loses nothing)."""

import threading

import numpy as np
import pytest

from caltech_bifrost_dsp_tpu import config as cfgmod
from caltech_bifrost_dsp_tpu.io import native, source
from caltech_bifrost_dsp_tpu.runtime.driver import XEnginePipeline

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

CFG = cfgmod.XEngineConfig(nstand=8, nchan=32, ntime_gulp=48, acc_len=96,
                           acc_len_slow=192, nbeam=4, ntime_sum=12,
                           nchan_sum=4, npipeline=2, pfb_ntap=4,
                           adc_dtype="int8", pfb_fft_impl="matmul")
TONE_CHAN = 9
PORT = 19641


class _Grab:
    checkfile = None

    def __init__(self):
        self.dumps = []

    def send_matrix(self, dense, *a, **k):
        self.dumps.append(np.array(dense))
        return 0


def _run_udp(ngulp, port):
    gen = source.ADCSource(CFG, mode="tone", tone_chan=TONE_CHAN,
                           amplitude=50.0)
    src = native.AdcCaptureSource(CFG, "127.0.0.1", port)
    L = 2 * CFG.nchan

    def tx():
        for i in range(ngulp):
            frames = gen.gulp(i).reshape(CFG.ntime_gulp, L, CFG.ninput)
            native.transmit_gulp("127.0.0.1", port,
                                 frames.view(np.uint8),
                                 seq0=i * CFG.ntime_gulp,
                                 nchan_per_pkt=L,
                                 npol_per_pkt=CFG.ninput,
                                 delay_ns=20_000)

    t = threading.Thread(target=tx)
    grab = _Grab()
    pipe = XEnginePipeline(CFG, src, corr_outputs=[grab],
                           quant_scale=0.2, fx_mode=True)
    t.start()
    try:
        pipe.run(ngulp, timeout_s=300)
    finally:
        t.join(timeout=30)
        src.close()
    return grab.dumps, src


def test_fx_udp_adc_matches_inprocess_source():
    ngulp = CFG.acc_len_slow // CFG.ntime_gulp
    dumps_udp, src = _run_udp(ngulp, PORT)
    stats = src.stats()
    assert stats["nmissing"] == 0
    assert len(dumps_udp) == 1

    # identical samples through the in-process source
    gen = source.ADCSource(CFG, mode="tone", tone_chan=TONE_CHAN,
                           amplitude=50.0)
    grab = _Grab()
    pipe = XEnginePipeline(CFG, gen, corr_outputs=[grab],
                           quant_scale=0.2, fx_mode=True)
    pipe.run(ngulp, timeout_s=300)
    assert len(grab.dumps) == 1
    np.testing.assert_array_equal(dumps_udp[0], grab.dumps[0])

    autos = np.real(dumps_udp[0][:, 0, 0])
    assert autos.argmax() == TONE_CHAN


def test_fx_udp_survives_packet_loss():
    """Dropped ADC packets become zero-filled holes (digitizer
    silence): the pipeline still dumps, loss is accounted, and the
    tone still dominates its channel."""
    ngulp = CFG.acc_len_slow // CFG.ntime_gulp
    gen = source.ADCSource(CFG, mode="tone", tone_chan=TONE_CHAN,
                           amplitude=50.0)
    src = native.AdcCaptureSource(CFG, "127.0.0.1", PORT + 7)
    L = 2 * CFG.nchan

    def tx():
        for i in range(ngulp):
            frames = gen.gulp(i).reshape(CFG.ntime_gulp, L, CFG.ninput)
            native.transmit_gulp("127.0.0.1", PORT + 7,
                                 frames.view(np.uint8),
                                 seq0=i * CFG.ntime_gulp,
                                 nchan_per_pkt=L // 4,
                                 npol_per_pkt=CFG.ninput,
                                 miss_every=50, delay_ns=20_000)
        # advance the stream so the final lossy gulp passes the lead
        # rule (the capture releases a holey gulp once later gulps land)
        tail = np.zeros((CFG.ntime_gulp, L, CFG.ninput), np.uint8)
        for j in range(2):
            native.transmit_gulp("127.0.0.1", PORT + 7, tail,
                                 seq0=(ngulp + j) * CFG.ntime_gulp,
                                 nchan_per_pkt=L,
                                 npol_per_pkt=CFG.ninput,
                                 delay_ns=20_000)

    t = threading.Thread(target=tx)
    grab = _Grab()
    pipe = XEnginePipeline(CFG, src, corr_outputs=[grab],
                           quant_scale=0.2, fx_mode=True)
    t.start()
    try:
        pipe.run(ngulp, timeout_s=300)
    finally:
        t.join(timeout=30)
        stats = src.stats()
        src.close()
    assert stats["nmissing"] > 0  # loss actually happened and is counted
    assert grab.dumps
    autos = np.real(grab.dumps[-1][:, 0, 0])
    assert autos.argmax() == TONE_CHAN


def test_adc_capture_source_rejects_f32():
    with pytest.raises(ValueError):
        native.AdcCaptureSource(CFG.replace(adc_dtype="float32"),
                                "127.0.0.1", PORT + 1)


def test_fx_udp_cli_wiring():
    """--fx without --fakesource builds the UDP ADC source (and
    rejects f32); checked at the build_pipeline level."""
    import logging

    from caltech_bifrost_dsp_tpu.scripts import pipeline as pcli

    args = pcli.build_parser().parse_args(
        ["--nstand", "8", "--nchan", "32", "--nbeam", "4",
         "--ntime_gulp", "48", "--acc_len", "96", "--acc_len_slow",
         "192", "--fx", "--adc-dtype", "int8", "--port",
         str(PORT + 2), "--ip", "127.0.0.1"])
    pipe = pcli.build_pipeline(args, logging.getLogger("t"))
    try:
        assert isinstance(pipe.source, native.AdcCaptureSource)
        assert pipe.fx_mode
    finally:
        pipe.source.close()

    args_f32 = pcli.build_parser().parse_args(
        ["--nstand", "8", "--nchan", "32", "--nbeam", "4",
         "--ntime_gulp", "48", "--acc_len", "96", "--acc_len_slow",
         "192", "--fx", "--port", str(PORT + 3)])
    with pytest.raises(SystemExit):
        pcli.build_pipeline(args_f32, logging.getLogger("t"))
