"""Cross-run the REFERENCE's own golden-vector generator and
byte-compare its files against this package's re-implementation.

The strongest possible parity claim: the reference script
(pipeline/verification/make_golden_inputs.py) is executed verbatim in a
subprocess, and its ``in_*.dat`` / ``corr_*.dat`` outputs must be
byte-identical to ``verification/golden.py``'s (modulo the wall-clock
``time`` field in the JSON header line, which differs between any two
runs of the reference itself).  The reference-generated files then
drive the pipeline's ``--testdatain/--testdatacorr`` exact-equality
gate end-to-end.
"""

import json
import os
import subprocess
import sys

import pytest

from caltech_bifrost_dsp_tpu.scripts import pipeline
from caltech_bifrost_dsp_tpu.verification import golden

REF = "/root/reference/pipeline/verification/make_golden_inputs.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference checkout unavailable")


def run_reference_generator(datapath, ntime, nchan, nstand, npol,
                            accshort, chanramp=False):
    """Execute the reference script's source VERBATIM in a subprocess.

    The script predates numpy 1.24 (it uses the removed ``np.complex``
    alias, make_golden_inputs.py:122,149); only that deprecated alias is
    restored before handing control to the unmodified source.
    """
    argv = ["make_golden_inputs.py", "-t", str(ntime), "-c", str(nchan),
            "-s", str(nstand), "-p", str(npol),
            "--accshort", str(accshort), "--datapath", str(datapath)]
    if chanramp:
        argv.append("--chanramp")
    shim = (
        "import numpy as np, runpy, sys\n"
        "np.complex = complex\n"
        f"sys.argv = {argv!r}\n"
        "try:\n"
        f"    runpy.run_path({REF!r}, run_name='__main__')\n"
        "except SystemExit as e:\n"
        "    sys.exit(e.code or 0)\n")
    res = subprocess.run([sys.executable, "-c", shim],
                         capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stderr


def read_header_and_payload(path):
    with open(path, "rb") as fh:
        meta = json.loads(fh.readline().decode())
        return meta, fh.read()


def assert_files_match(ref_path, our_path):
    ref_meta, ref_raw = read_header_and_payload(ref_path)
    our_meta, our_raw = read_header_and_payload(our_path)
    # header: identical key order and values except the wall-clock stamp
    ref_meta["time"] = our_meta["time"] = 0.0
    assert json.dumps(ref_meta) == json.dumps(our_meta)
    assert len(ref_raw) == len(our_raw)
    assert ref_raw == our_raw, "payload bytes differ"


@pytest.mark.parametrize("chanramp", [False, True],
                         ids=["random", "chanramp"])
def test_generator_files_byte_identical(tmp_path, chanramp):
    ntime, nchan, nstand, npol, acc = 96, 4, 8, 2, 48
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()
    run_reference_generator(ref_dir, ntime, nchan, nstand, npol, acc,
                            chanramp=chanramp)
    golden.write_input_file(
        golden.input_filename(str(our_dir), ntime, nchan, nstand, npol,
                              chanramp=chanramp),
        ntime, nchan, nstand, npol, acc, chanramp=chanramp)
    golden.write_corr_file(
        golden.corr_filename(str(our_dir), ntime, acc, nchan, nstand,
                             npol, chanramp=chanramp),
        ntime, nchan, nstand, npol, acc, chanramp=chanramp)
    for fname in sorted(os.listdir(ref_dir)):
        assert_files_match(str(ref_dir / fname), str(our_dir / fname))
    assert len(os.listdir(ref_dir)) == 2  # in_ + corr_


def test_pipeline_golden_gate_from_reference_files(tmp_path):
    """The pipeline's exact-equality gate must pass when fed files the
    REFERENCE script generated (not our re-implementation), closing the
    loop reference-generator -> TPU pipeline."""
    ntime, nchan, nstand, acc = 480, 16, 16, 240
    run_reference_generator(tmp_path, ntime, nchan, nstand, 2, acc)
    in_path = golden.input_filename(str(tmp_path), ntime, nchan, nstand, 2)
    corr_path = golden.corr_filename(str(tmp_path), ntime, acc, nchan,
                                     nstand, 2)
    rc = pipeline.main([
        "--fakesource", "--testdatain", in_path,
        "--testdatacorr", corr_path, "--testdatacorr_acc_len", str(acc),
        "--nchan", str(nchan), "--nstand", str(nstand), "--nbeam", "4",
        "--ntime_gulp", "48", "--acc_len", str(acc),
        "--acc_len_slow", str(2 * acc), "--ngulp", str(ntime // 48)])
    assert rc == 0
