"""Worker process for the multi-host test: joins a 2-process
``jax.distributed`` runtime (4 virtual CPU devices each), runs the
stateful sharded X/B step over the global ('time', 'chan') mesh built by
``parallel.multihost.global_mesh``, and writes the gathered products +
arming arithmetic to an .npz for the parent to compare.

Run: python multihost_worker.py <pid> <nproc> <coord_port> <outdir> \
        [placement]

``placement`` (default "chan") picks the cross-process mesh axis:
"chan" is the production policy (SCALING.md §3 — frequency shards
across hosts, only corner-turn slabs on DCN, matching the reference's
share-nothing server layout, lwa352-pipeline.py:164-180); "time" is
the sequence-parallel alternative (psum over DCN).
"""

import os
import sys

pid, nproc = int(sys.argv[1]), int(sys.argv[2])
port, outdir = sys.argv[3], sys.argv[4]
placement = sys.argv[5] if len(sys.argv) > 5 else "chan"

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from caltech_bifrost_dsp_tpu import config as cfgmod  # noqa: E402
from caltech_bifrost_dsp_tpu.ops import beamform as bf  # noqa: E402
from caltech_bifrost_dsp_tpu.ops import corr_subsel as cs  # noqa: E402
from caltech_bifrost_dsp_tpu.parallel import mesh as pmesh  # noqa: E402
from caltech_bifrost_dsp_tpu.parallel import multihost  # noqa: E402
from caltech_bifrost_dsp_tpu.utils import timeutils  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
assert jax.process_count() == nproc
assert jax.device_count() == 4 * nproc, jax.device_count()

mesh = multihost.global_mesh(placement=placement)
if placement == "time":
    assert mesh.shape["time"] == nproc and mesh.shape["chan"] == 4
else:                                   # chan spans processes
    assert mesh.shape["chan"] == nproc and mesh.shape["time"] == 4
    # every device in this process's mesh column is local: the
    # corner-turn is the ONLY collective crossing processes
    col = [d for d in mesh.devices[:, jax.process_index()]]
    assert all(d.process_index == jax.process_index() for d in col)

CFG = cfgmod.XEngineConfig(nstand=8, nchan=32, ntime_gulp=48, acc_len=96,
                           acc_len_slow=192, nbeam=4, ntime_sum=12,
                           nchan_sum=4, npipeline=2)

lo, hi = multihost.local_channel_range(CFG, mesh)
assert 0 <= lo < hi <= CFG.nchan

rng = np.random.RandomState(42)         # identical data on every host
packed_np = rng.randint(0, 256, [CFG.ntime_gulp, CFG.nchan, CFG.ninput]
                        ).astype(np.uint8)
gains_np = np.ones((CFG.nchan, CFG.nbeam, CFG.ninput), np.float32)
pairs_np = cs.baselines_to_inputs(
    cs.default_baselines(CFG.nvis_out, CFG.nstand)).astype(np.int32)


def make(arr, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sh,
                                        lambda idx: arr[idx])


vis_spec = P("chan", None, None)
part_spec = P("time", "chan", None, None)
zero = np.zeros((CFG.nchan, CFG.ninput, CFG.ninput), np.int32)
n_time = mesh.shape["time"]
zero_part = np.zeros((n_time,) + zero.shape, np.int32)
state = ((make(zero_part, part_spec), make(zero_part, part_spec)),
         (make(zero, vis_spec), make(zero, vis_spec)))
packed = make(packed_np, P("time", "chan", None))
gains = bf.BeamGains(make(gains_np, P("chan", None, None)),
                     make(np.zeros_like(gains_np), P("chan", None, None)))
pairs = make(pairs_np, P())

from caltech_bifrost_dsp_tpu.ops.correlate import Vis  # noqa: E402
import jax.numpy as jnp  # noqa: E402

step = jax.jit(pmesh.xengine_sharded_state_fn(
    CFG, mesh, fast_first=True, fast_last=True, slow_first=True))
with jax.set_mesh(mesh):
    st, out, vlbi = step((Vis(*state[0]), Vis(*state[1])), packed, gains,
                         pairs)

fast_re = multihost_utils.process_allgather(out.vis.real, tiled=True)
fast_im = multihost_utils.process_allgather(out.vis.imag, tiled=True)
sub_re = multihost_utils.process_allgather(out.subsel.real, tiled=True)
power = multihost_utils.process_allgather(out.bf_power, tiled=True)
vlbi_g = multihost_utils.process_allgather(vlbi, tiled=True)

# the FX (north-star) sharded step across processes: PFB halo rides the
# cross-process 'time' axis (DCN in production), corner-turn rides the
# in-process 'chan' axis (ICI); all processes must gather identical
# packed-products
from caltech_bifrost_dsp_tpu.ops import pfb as pfb_ops  # noqa: E402

FXCFG = CFG.replace(pfb_fft_impl="matmul")
L = 2 * FXCFG.nchan
nspec_total = CFG.ntime_gulp
adc_np = rng.standard_normal(
    [nspec_total * L, FXCFG.ninput]).astype(np.float32) * 3
carry_np = np.zeros(((FXCFG.pfb_ntap - 1) * L, FXCFG.ninput), np.float32)
window_np = pfb_ops.pfb_window(FXCFG.nchan, FXCFG.pfb_ntap)
fxstep = jax.jit(pmesh.fx_sharded_state_fn(
    FXCFG, mesh, fast_first=True, fast_last=True, slow_first=True))
with jax.set_mesh(mesh):
    stf, outf, vlbif = fxstep(
        (Vis(make(zero_part, part_spec), make(zero_part, part_spec)),
         Vis(make(zero, vis_spec), make(zero, vis_spec))),
        make(adc_np, P("time", "chan")), make(carry_np, P(None, "chan")),
        make(window_np.astype(np.float32), P()),
        jnp.float32(1.0), gains, pairs)
fx_re = multihost_utils.process_allgather(outf.vis.real, tiled=True)
fx_im = multihost_utils.process_allgather(outf.vis.imag, tiled=True)

# arming alignment: every process derives the same next allowed start
# from the shared clock arithmetic (the reference's cross-pipeline arm,
# lwa352_utils.py:5-13 semantics)
start = timeutils.next_allowed_start(
    now=1_700_000_000.0, delay_s=5.0, sync_time=1_699_999_000.0,
    spectra_rate_hz=CFG.spectra_rate_hz, granularity=CFG.acc_len)

np.savez(os.path.join(outdir, f"out_{pid}.npz"),
         fast_re=np.asarray(fast_re), fast_im=np.asarray(fast_im),
         sub_re=np.asarray(sub_re), power=np.asarray(power),
         vlbi=np.asarray(vlbi_g), start=start,
         fx_re=np.asarray(fx_re), fx_im=np.asarray(fx_im),
         chan_range=np.array([lo, hi]), packed=packed_np,
         adc=adc_np, n_time=mesh.shape["time"],
         gains=gains_np, pairs=pairs_np)
print(f"worker {pid} OK", flush=True)
