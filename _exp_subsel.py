"""A/B the subsel engines in-chain and standalone on the real chip."""
import time, json
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from caltech_bifrost_dsp_tpu.config import LWA352
from caltech_bifrost_dsp_tpu.models import xengine
from caltech_bifrost_dsp_tpu.ops.pallas.beamform_fused import stacked_gains
from caltech_bifrost_dsp_tpu.ops.pallas.corr_blk import padded_ni
from caltech_bifrost_dsp_tpu.ops import correlate as corr
from caltech_bifrost_dsp_tpu.ops import corr_subsel as cs
from caltech_bifrost_dsp_tpu.ops.pallas.subsel_gather import corr_subsel_pallas

rng = np.random.RandomState(1)
base = LWA352
T, C, I = base.acc_len, base.nchan, base.ninput
NI = padded_ni(I)
packed = jnp.asarray(rng.randint(0, 255, [T, C, I]).astype(np.uint8))
vis_pad = corr.Vis(
    jnp.asarray(rng.randint(-1 << 20, 1 << 20, [C, NI, NI]), jnp.int32),
    jnp.asarray(rng.randint(-1 << 20, 1 << 20, [C, NI, NI]), jnp.int32))
pairs = jnp.asarray(cs.baselines_to_inputs(
    cs.default_baselines(base.nvis_out, base.nstand)).astype(np.int32))


def timeit(fn, args, probe, niter=10):
    def fetch(o):
        return float(np.asarray(jax.device_get(probe(o))))
    out = fn(*args); fetch(out)
    t0 = time.perf_counter(); fetch(fn(*args))
    ovh = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(niter):
        out = fn(*args)
    fetch(out)
    return max((time.perf_counter() - t0 - ovh) / (niter - 1), 1e-9)


res = {}
probe_v = jax.jit(lambda v: jnp.sum(v.real[0, :8]) + jnp.sum(v.imag[1, :8]))

res["subsel_xla_padded"] = timeit(
    jax.jit(lambda v, p: cs.corr_subsel(v, p, base.nchan_sum)),
    (vis_pad, pairs), probe_v)
res["subsel_pallas_padded"] = timeit(
    jax.jit(lambda v, p: corr_subsel_pallas(v, p, base.nchan_sum)),
    (vis_pad, pairs), probe_v)

probe_step = jax.jit(lambda o: jnp.sum(o[0].vis_slow.real[0, 0, :8]))
for eng in ("xla", "pallas"):
    cfg = base.replace(corr_engine="pallas_blk", bf_engine="pallas",
                       subsel_engine=eng)
    state, _, gains, _ = xengine.default_inputs(cfg)
    gstack = stacked_gains(gains, xengine.bf_operand_ni(cfg))

    def step(st, pk, gs, pr, cfg=cfg):
        return xengine.xengine_step(st, pk, gs, pr, True, True, False, cfg)

    res[f"step_full_{eng}"] = timeit(jax.jit(step),
                                     (state, packed, gstack, pairs),
                                     probe_step)

for k, v in res.items():
    print(f"{k}: {v*1e3:.2f} ms")
print(json.dumps({k: round(v * 1e3, 2) for k, v in res.items()}))
