"""Genuinely multi-process mesh execution: two jax.distributed processes
(4 virtual CPU devices each) form one global ('time', 'chan') mesh via
parallel.multihost and run the stateful sharded X/B + FX steps; products
must match the single-process references exactly, and the arming
arithmetic must agree across processes.

Both axis placements are exercised (VERDICT r3 #3):

- ``chan`` across processes — the PRODUCTION policy (SCALING.md §3):
  share-nothing frequency shards per host like the reference's server
  layout (lwa352-pipeline.py:164-180); the packed-byte corner-turn is
  the only cross-process collective.
- ``time`` across processes — sequence parallelism with the PFB halo
  and visibility psum crossing processes.
"""

import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.parametrize("placement,port", [("chan", 19793),
                                            ("time", 19791)])
def test_two_process_global_mesh(tmp_path, placement, port):
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS",
                        "PALLAS_AXON_POOL_IPS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port),
         str(tmp_path), placement], env=env, stdout=subprocess.PIPE,
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
    # sharded FX step: PFB halo + corner-turn, one of which crosses
    # processes depending on placement)
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

    if placement == "chan":
        # production placement: each process owns a DISJOINT channel
        # range (the reference's share-nothing frequency sharding);
        # together they cover the band
        ranges = sorted([tuple(a["chan_range"]), tuple(b["chan_range"])])
        assert ranges[0][1] == ranges[1][0]          # disjoint, abutting
        assert ranges[0][0] == 0 and ranges[1][1] == 32
    else:
        # time placement: both processes see the full channel range
        assert 0 <= a["chan_range"][0] < a["chan_range"][1] <= 32

    # exact equality vs the single-process numpy golden reference
    from caltech_bifrost_dsp_tpu.verification import golden

    packed = a["packed"]
    # golden convention [chan, s0, s1, p0, p1] -> dense [chan, i, j]
    ref = golden.reference_correlation(packed.reshape(48, 32, 8, 2))
    ref = ref.transpose(0, 1, 3, 2, 4).reshape(32, 16, 16)
    np.testing.assert_array_equal(a["fast_re"], ref.real.astype(np.int64))
    np.testing.assert_array_equal(a["fast_im"], ref.imag.astype(np.int64))

    # the FX (north-star) path is exact vs the single-device unsharded
    # reference — the cross-process corner-turn / halo moved the right
    # bytes, not merely the same wrong bytes on both processes
    import jax.numpy as jnp

    from caltech_bifrost_dsp_tpu import config as cfgmod
    from caltech_bifrost_dsp_tpu.ops import beamform as bf
    from caltech_bifrost_dsp_tpu.parallel import mesh as pmesh

    cfg = cfgmod.XEngineConfig(
        nstand=8, nchan=32, ntime_gulp=48, acc_len=96, acc_len_slow=192,
        nbeam=4, ntime_sum=12, nchan_sum=4, npipeline=2,
        pfb_fft_impl="matmul")
    gains = bf.BeamGains(jnp.asarray(a["gains"]),
                         jnp.zeros_like(jnp.asarray(a["gains"])))
    fxref = pmesh.fx_reference_unsharded(
        cfg, jnp.asarray(a["adc"]), jnp.asarray(
            __import__("caltech_bifrost_dsp_tpu.ops.pfb",
                       fromlist=["pfb"]).pfb_window(cfg.nchan,
                                                    cfg.pfb_ntap)
            .astype(np.float32)),
        gains, jnp.asarray(a["pairs"]), jnp.float32(1.0),
        n_time_shards=int(a["n_time"]))
    np.testing.assert_array_equal(a["fx_re"],
                                  np.asarray(fxref.vis.real))
    np.testing.assert_array_equal(a["fx_im"],
                                  np.asarray(fxref.vis.imag))
