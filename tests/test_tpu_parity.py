"""On-chip golden-parity gate (VERDICT r4 #1) + its logic self-test.

The real gate (``CBD_TPU_PARITY=1``) runs scripts/tpu_parity.py in a
subprocess with the TPU tunnel restored (the conftest forces this
process onto CPU), at the reference's full production geometry
(7200t x 352s x 2p, 192c and 184c), writing ``TPUPARITY_r05.json``.

The always-on self-test runs the same script logic in-process at a tiny
geometry (CPU interpret mode): it proves the host-side expected-value
conventions (GEMM correlation, subsel gather, beam/VLBI layouts) agree
with the engines BEFORE any tunnel time is spent — a failure here is a
script bug, a failure on-chip only is a Mosaic/layout bug.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_script_logic_tiny(tmp_path):
    from caltech_bifrost_dsp_tpu.scripts import tpu_parity

    out = str(tmp_path / "parity.json")
    rc = tpu_parity.main(["--tiny", "--nchan", "16", "--ntime", "288",
                          "--nstand", "8", "--out", out])
    assert rc == 0
    import json

    art = json.load(open(out))
    assert art["pass"] is True
    assert art["geometries"]["16c"]["slow_re"]["exact"]


@pytest.mark.skipif(os.environ.get("CBD_TPU_PARITY") != "1",
                    reason="on-chip parity gate: set CBD_TPU_PARITY=1 "
                           "on a host with the TPU tunnel")
def test_tpu_parity_production_geometry():
    """EXACT integer equality of every fast dump, the slow accumulator,
    the subselection and the VLBI voltages, computed by the committed
    Mosaic engines ON THE REAL CHIP at 7200t x 352s, 192c AND 184c."""
    env = dict(os.environ)
    # undo the conftest's CPU forcing for the child
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    saved = env.pop("CBD_SAVED_AXON_POOL_IPS", None)
    if saved:
        env["PALLAS_AXON_POOL_IPS"] = saved
    out = os.path.join(REPO, "TPUPARITY_r05.json")
    r = subprocess.run(
        [sys.executable, "-m",
         "caltech_bifrost_dsp_tpu.scripts.tpu_parity", "--out", out],
        cwd=REPO, env=env, timeout=3600 * 2,
        capture_output=True, text=True)
    sys.stdout.write(r.stdout[-4000:])
    sys.stderr.write(r.stderr[-4000:])
    assert r.returncode == 0, f"on-chip parity gate failed (see {out})"
