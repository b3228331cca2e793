"""Genuinely multi-process mesh execution: two jax.distributed processes
(4 virtual CPU devices each) form one global ('time', 'chan') mesh via
parallel.multihost and run the stateful sharded X/B step; products must
match the single-process numpy reference exactly, and the arming
arithmetic must agree across processes (VERDICT r1 missing 4)."""

import os
import subprocess
import sys

import numpy as np
import pytest


def test_two_process_global_mesh(tmp_path):
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_worker.py")
    port = 19791
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PALLAS_AXON_POOL_IPS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port),
         str(tmp_path)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    a = np.load(tmp_path / "out_0.npz")
    b = np.load(tmp_path / "out_1.npz")
    # both processes observe identical gathered products (incl. the
    # sharded FX step: cross-process PFB halo + in-process corner-turn)
    for key in ("fast_re", "fast_im", "sub_re", "power", "vlbi",
                "fx_re", "fx_im"):
        np.testing.assert_array_equal(a[key], b[key])
    # FX visibilities are Hermitian with non-negative autos
    fx = a["fx_re"] + 1j * a["fx_im"]
    np.testing.assert_array_equal(fx, np.conj(np.swapaxes(fx, 1, 2)))
    assert (np.real(np.diagonal(fx, axis1=1, axis2=2)) >= 0).all()
    # cross-process arming alignment
    assert a["start"] == b["start"]
    assert int(a["start"]) % 96 == 0
    # channel ownership covers disjoint... (time axis spans processes, so
    # both see the full channel range here; just sanity-check bounds)
    assert 0 <= a["chan_range"][0] < a["chan_range"][1] <= 32

    # exact equality vs the single-process numpy golden reference
    from caltech_bifrost_dsp_tpu.verification import golden

    packed = a["packed"]
    # golden convention [chan, s0, s1, p0, p1] -> dense [chan, i, j]
    ref = golden.reference_correlation(packed.reshape(48, 32, 8, 2))
    ref = ref.transpose(0, 1, 3, 2, 4).reshape(32, 16, 16)
    np.testing.assert_array_equal(a["fast_re"], ref.real.astype(np.int64))
    np.testing.assert_array_equal(a["fast_im"], ref.imag.astype(np.int64))
