"""Scaling-efficiency benchmark harness.

Measures the sharded FX+B program (PFB -> halo exchange -> corner-turn
-> correlate -> beamform) at 1, 2, ... N devices and reports
Msamples/s/chip plus scaling efficiency — the BASELINE.json metric
("Msamples/s/chip through PFB+corr; N-host scaling eff.").

**Strong scaling, fixed problem**: every mesh size runs the *same*
problem (same config, same spectra count), so the collective and
partition overhead is isolated from problem-size effects.

**Compute normalization on virtual CPU meshes** (``--cpu N``): N virtual
devices share the host's physical cores, so the *aggregate* compute
budget is constant across mesh sizes.  Under strong scaling the ideal
aggregate throughput is therefore flat, and

    constant_compute_efficiency(n) = aggregate_tput(n) / aggregate_tput(1)

directly measures the fraction of throughput retained after sharding —
i.e. the cost of the halo ppermute, corner-turn all_to_all, psum and
partition bookkeeping at a constant compute budget.  On a real TPU slice
(per-device compute actually scales with n) the per-chip efficiency
``msamples_per_s_per_chip(n) / msamples_per_s_per_chip(1)`` is the
headline number instead; both are reported.

Each result row also carries the analytic per-collective traffic from
:func:`..parallel.mesh.collective_volumes` so measured overhead can be
attributed to wire bytes (see SCALING.md for the ICI/DCN budget model).

Timing is queue-safe: K invocations are chained by a data dependency and
a device-side scalar is fetched once (reference perf taxonomy:
corr_block.py:453-457 `process_time`/`gbps`).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def measure(cfg, mesh, gulp_spectra: int, niter: int) -> float:
    """Seconds per FAST WINDOW (``acc_len`` spectra) streamed through the
    stateful sharded FX step — the production path: ``acc_len /
    gulp_spectra`` calls per window, per-time-shard partial accumulation
    mid-window, psum + subsel at the dump gulp."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops import beamform as bf
    from ..ops import corr_subsel as cs
    from ..ops import pfb as pfb_ops
    from ..parallel import mesh as pmesh

    rng = np.random.RandomState(0)
    adc = jnp.asarray(rng.standard_normal(
        [gulp_spectra * 2 * cfg.nchan, cfg.ninput]).astype(np.float32))
    window = jnp.asarray(pfb_ops.pfb_window(cfg.nchan, cfg.pfb_ntap))
    gains = bf.BeamGains(
        jnp.ones((cfg.nchan, cfg.nbeam, cfg.ninput), jnp.float32),
        jnp.zeros((cfg.nchan, cfg.nbeam, cfg.ninput), jnp.float32))
    pairs = jnp.asarray(cs.baselines_to_inputs(
        cs.default_baselines(cfg.nvis_out, cfg.nstand)).astype(np.int32))
    halo_n = (cfg.pfb_ntap - 1) * 2 * cfg.nchan
    carry = jnp.zeros((halo_n, cfg.ninput), jnp.float32)
    gulps_per_window = cfg.acc_len // gulp_spectra

    def flags(k):
        return (k == 0, k == gulps_per_window - 1, True)

    steps = {}
    for k in range(gulps_per_window):
        key = flags(k)
        if key not in steps:
            # donate the carried accumulator state: the int32 partial
            # planes alias in place instead of being reallocated+copied
            # every gulp (1.5 GB/gulp at production shape)
            steps[key] = jax.jit(pmesh.fx_sharded_state_fn(
                cfg, mesh, *key), donate_argnums=(0,))
    probe = jax.jit(lambda o: jnp.sum(o.vis.real[0, 0, :8]))

    def run_window(state):
        out = None
        for k in range(gulps_per_window):
            state, out, _ = steps[flags(k)](state, adc, carry, window,
                                            jnp.float32(1.0), gains,
                                            pairs)
        return state, out

    with jax.set_mesh(mesh):
        state = pmesh.zero_sharded_state(cfg, mesh)
        state, out = run_window(state)  # compile + settle
        _ = np.asarray(jax.device_get(probe(out)))
        t0 = time.perf_counter()
        for _ in range(niter):
            state, out = run_window(state)
        _ = np.asarray(jax.device_get(probe(out)))
        return (time.perf_counter() - t0) / niter


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="FX scaling benchmark")
    p.add_argument("--cpu", type=int, default=0,
                   help="force CPU with N virtual devices")
    p.add_argument("--nspec", type=int, default=0,
                   help="spectra per gulp (default: cfg.ntime_gulp; "
                        "fixed across mesh sizes)")
    p.add_argument("--niter", type=int, default=5)
    p.add_argument("--nstand", type=int, default=64)
    p.add_argument("--nchan", type=int, default=128)
    p.add_argument("--production", action="store_true",
                   help="run the full production operating point "
                        "(352 stands, 192 chan, 480-spectra gulp — the "
                        "reference's fixed shape, install_xgpu.sh:5)")
    p.add_argument("--meshes", default="",
                   help="explicit TxC mesh list, e.g. '1x1,1x8,2x4' "
                        "(default: powers of 2 with time<=2)")
    args = p.parse_args(argv)

    import os

    if args.cpu:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_"
                                     f"count={args.cpu}")
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    if args.cpu:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from ..config import LWA352, XEngineConfig
    from ..parallel import mesh as pmesh

    if args.production:
        cfg = LWA352
    else:
        cfg = XEngineConfig(
            nstand=args.nstand, nchan=args.nchan,
            ntime_gulp=48, acc_len=96, acc_len_slow=192, nbeam=8,
            ntime_sum=12, nchan_sum=4, npipeline=2, pfb_ntap=4)
    nspec = args.nspec or cfg.ntime_gulp  # one gulp per call

    ndev = len(jax.devices())
    results = {}
    if args.meshes:
        shapes = [tuple(int(v) for v in m.split("x"))
                  for m in args.meshes.split(",")]
    else:
        shapes, n = [], 1
        while n <= ndev:
            shapes.append((2 if n % 2 == 0 else 1,
                           n // (2 if n % 2 == 0 else 1)))
            n *= 2
    for n_time, n_chan in shapes:
        n = n_time * n_chan
        if n > ndev:
            print(f"{n_time}x{n_chan}: needs {n} devices, skipped",
                  file=sys.stderr)
            continue
        if cfg.nchan % n_chan or cfg.ninput % n_chan or nspec % n_time:
            print(f"n={n}: shape not divisible, skipped", file=sys.stderr)
            continue
        mesh = pmesh.make_mesh(n_time, n_chan,
                               devices=jax.devices()[:n])
        dt = measure(cfg, mesh, nspec, args.niter)
        samples = cfg.acc_len * cfg.nchan * cfg.ninput  # per window
        vols = pmesh.collective_volumes(cfg, n_time, n_chan,
                                        gulp_spectra=nspec)
        key = f"{n_time}x{n_chan}"
        results[key] = {"n": n, "sec_per_window": dt,
                        "msamples_per_s": samples / dt / 1e6,
                        "msamples_per_s_per_chip": samples / dt / 1e6 / n,
                        "collective_bytes_per_device_per_window": {
                            v["collective"]: (v["per_device_bytes_per_fire"]
                                              * v["fires_per_window"])
                            for v in vols["collectives"]}}
        print(f"n={n} ({key}): {dt*1e3:.1f} ms/window, "
              f"{results[key]['msamples_per_s']:.1f} Msamples/s "
              f"({results[key]['msamples_per_s_per_chip']:.1f}/chip)",
              file=sys.stderr)
    done = sorted(results, key=lambda k: (results[k]["n"], k))
    if not done:
        print(json.dumps({"metric": "fx_scaling_strong",
                          "error": "no mesh shape ran (too few devices "
                                   "or non-divisible shape); see stderr"}))
        return 1
    base = results[done[0]]
    out = {"metric": "fx_scaling_strong",
           "platform": jax.devices()[0].platform,
           "shape": {"nstand": cfg.nstand, "nchan": cfg.nchan,
                     "nspec": nspec, "production": bool(args.production)},
           "devices": {k: results[k] for k in done},
           "per_chip_efficiency": {
               k: (results[k]["msamples_per_s_per_chip"]
                   / base["msamples_per_s_per_chip"])
               for k in done},
           "constant_compute_efficiency": {
               k: (results[k]["msamples_per_s"]
                   / base["msamples_per_s"])
               for k in done}}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
