"""184-channel golden coverage (VERDICT r3 #7).

The reference ships 184-channel test vectors alongside the 192-channel
ones (reference: pipeline/verification/test_vectors/
in_7200t_184c_352s_2p_deadbeef.dat.tar.gz) precisely because channel
counts that are NOT the power-of-two-friendly production value shake
out padding/indexing bugs.  Two gates:

1. the repo's generator is byte-identical to the reference script at
   the 184-channel geometry (same RNG stream, same header, same
   payload), so vectors we generate at 184c are interchangeable with
   the shipped tarballs;
2. the pipeline passes its end-to-end exact-equality golden gate at a
   184-channel geometry with the PRODUCTION Pallas engines active
   (256-block padding, fused accumulator algebra, bands subselection)
   — the padded-engine path, not just the XLA reference path.
"""

import os

import pytest

from caltech_bifrost_dsp_tpu.scripts import pipeline
from caltech_bifrost_dsp_tpu.verification import golden

from test_golden_crossrun import (REF, assert_files_match,
                                  run_reference_generator)


@pytest.mark.skipif(not os.path.exists(REF),
                    reason="reference checkout unavailable")
def test_generator_184c_byte_identical_to_reference(tmp_path):
    """The 184-channel vector files byte-match the reference script's
    (the same guarantee the crossrun test gives at 4 channels, at the
    odd-geometry channel count the reference ships tarballs for)."""
    ntime, nchan, nstand, npol, acc = 96, 184, 8, 2, 48
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()
    run_reference_generator(ref_dir, ntime, nchan, nstand, npol, acc)
    golden.write_input_file(
        golden.input_filename(str(our_dir), ntime, nchan, nstand, npol),
        ntime, nchan, nstand, npol, acc)
    golden.write_corr_file(
        golden.corr_filename(str(our_dir), ntime, acc, nchan, nstand,
                             npol),
        ntime, nchan, nstand, npol, acc)
    names = sorted(os.listdir(ref_dir))
    assert len(names) == 2
    assert "184c" in names[0]
    for fname in names:
        assert_files_match(str(ref_dir / fname), str(our_dir / fname))


def test_pipeline_golden_gate_184c_pallas_engines(tmp_path):
    """End-to-end exact equality at 184 channels with the committed
    production engines: 256-block Pallas correlator (padding rows live
    in the accumulators), fused Pallas beamformer, bands subselection.
    Exercises the non-power-of-two channel axis through the Pallas
    grid blocking (184 = 8*23 channel groups) and the 4-chan subsel
    averaging at the odd width."""
    ntime, nchan, nstand, acc = 192, 184, 16, 96
    in_path = golden.input_filename(str(tmp_path), ntime, nchan, nstand,
                                    2)
    corr_path = golden.corr_filename(str(tmp_path), ntime, acc, nchan,
                                     nstand, 2)
    golden.write_input_file(in_path, ntime, nchan, nstand, 2, acc)
    golden.write_corr_file(corr_path, ntime, nchan, nstand, 2, acc)
    rc = pipeline.main([
        "--fakesource", "--testdatain", in_path,
        "--testdatacorr", corr_path, "--testdatacorr_acc_len", str(acc),
        "--nchan", str(nchan), "--nstand", str(nstand), "--nbeam", "4",
        "--ntime_gulp", "48", "--acc_len", str(acc),
        "--acc_len_slow", str(2 * acc), "--ngulp", str(ntime // 48),
        "--corr-engine", "pallas_blk", "--bf-engine", "pallas",
        "--subsel-engine", "bands"])
    assert rc == 0
