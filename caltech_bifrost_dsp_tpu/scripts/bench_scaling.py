"""Scaling-efficiency benchmark harness.

Measures the sharded FX+B program (PFB -> corner-turn -> correlate ->
beamform) at 1, 2, ... N devices on the current platform and reports
Msamples/s/chip and scaling efficiency — the BASELINE.json metric
("Msamples/s/chip through PFB+corr; N-host scaling eff.").

On a real TPU slice this measures ICI-collective scaling; on the CPU
backend (``--cpu N``) it validates the harness and the collective paths
functionally.  Timing is queue-safe: K program invocations are chained by
a data dependency and a scalar is fetched once.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def measure(cfg, mesh, nspec_total: int, niter: int) -> float:
    """Seconds per program invocation on ``mesh``."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops import beamform as bf
    from ..ops import corr_subsel as cs
    from ..ops import pfb as pfb_ops
    from ..parallel import mesh as pmesh

    rng = np.random.RandomState(0)
    adc = jnp.asarray(rng.standard_normal(
        [nspec_total * 2 * cfg.nchan, cfg.ninput]).astype(np.float32))
    window = jnp.asarray(pfb_ops.pfb_window(cfg.nchan, cfg.pfb_ntap))
    gains = bf.BeamGains(
        jnp.ones((cfg.nchan, cfg.nbeam, cfg.ninput), jnp.float32),
        jnp.zeros((cfg.nchan, cfg.nbeam, cfg.ninput), jnp.float32))
    pairs = jnp.asarray(cs.baselines_to_inputs(
        cs.default_baselines(cfg.nvis_out, cfg.nstand)).astype(np.int32))
    fn = jax.jit(pmesh.fx_sharded_fn(cfg, mesh))
    probe = jax.jit(lambda o: jnp.sum(o.vis.real[0, 0, :8]))

    with jax.set_mesh(mesh):
        out = fn(adc, window, gains, pairs, jnp.float32(1.0))
        _ = np.asarray(jax.device_get(probe(out)))  # compile + settle
        t0 = time.perf_counter()
        # chain iterations through the input so the queue cannot lie
        a = adc
        for _ in range(niter):
            out = fn(a, window, gains, pairs, jnp.float32(1.0))
            a = a + 0 * out.bf_power[0, 0, 0, 0]
        _ = np.asarray(jax.device_get(probe(out)))
        return (time.perf_counter() - t0) / niter


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="FX scaling benchmark")
    p.add_argument("--cpu", type=int, default=0,
                   help="force CPU with N virtual devices")
    p.add_argument("--nspec", type=int, default=0,
                   help="spectra per invocation (default: sized to mesh)")
    p.add_argument("--niter", type=int, default=5)
    p.add_argument("--nstand", type=int, default=64)
    p.add_argument("--nchan", type=int, default=128)
    args = p.parse_args(argv)

    import os

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_"
                                     f"count={args.cpu}")
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from ..config import XEngineConfig
    from ..parallel import mesh as pmesh

    ndev = len(jax.devices())
    results = {}
    n = 1
    sizes = []
    while n <= ndev:
        sizes.append(n)
        n *= 2
    for n in sizes:
        n_time = 2 if n % 2 == 0 else 1
        n_chan = n // n_time
        cfg = XEngineConfig(
            nstand=args.nstand, nchan=max(args.nchan, 16 * n_chan),
            ntime_gulp=48, acc_len=96, acc_len_slow=192, nbeam=8,
            ntime_sum=12, nchan_sum=4, npipeline=2, pfb_ntap=4)
        nspec = args.nspec or (4 * n_time * cfg.ntime_sum)
        mesh = pmesh.make_mesh(n_time, n_chan,
                               devices=jax.devices()[:n])
        dt = measure(cfg, mesh, nspec, args.niter)
        samples = nspec * cfg.nchan * cfg.ninput
        results[n] = {"sec_per_call": dt,
                      "msamples_per_s": samples / dt / 1e6,
                      "msamples_per_s_per_chip": samples / dt / 1e6 / n}
        print(f"n={n}: {dt*1e3:.1f} ms/call, "
              f"{results[n]['msamples_per_s']:.1f} Msamples/s "
              f"({results[n]['msamples_per_s_per_chip']:.1f}/chip)",
              file=sys.stderr)
    base = results[sizes[0]]["msamples_per_s_per_chip"]
    out = {"metric": "fx_scaling",
           "devices": {str(n): results[n] for n in sizes},
           "scaling_efficiency": {
               str(n): results[n]["msamples_per_s_per_chip"] / base
               for n in sizes}}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
