"""Full-array cross-correlation ("X") on the MXU.

Replaces the reference's xGPU CUDA library (fixed-function 4-bit DP4A
X-engine, build config at reference: install_xgpu.sh:5; call sites at
reference: blocks/corr_block.py:253,445) with integer matmuls on the TPU
MXU:

    V[c, i, j] = sum_t  x[t, c, i] * conj(x[t, c, j])

computed as four int8 x int8 -> int32 batched matmuls per channel (real and
imaginary planes).  4-bit products are at most 2*8*8 = 128 per component and
accumulate exactly in int32 up to ~16.7M samples, far beyond the 240,000
sample slow-accumulation (reference: lwa352-pipeline.py:324), so outputs are
bit-exact against the golden-vector convention
``corr[..., s0, s1, p0, p1] = v(s0, p0) * conj(v(s1, p1))``
(reference: verification/README.md:60-62) when inputs are ordered
``input = npol*stand + pol``.

Unlike xGPU, the visibility matrix is kept dense ([chan, input, input], full
Hermitian) rather than register-tile triangular; the packed order exists
only in the verification shims (:mod:`.xgpu_order`).  Dense layout is the
right trade on TPU: the MXU wants large square tiles, HBM capacity is ample,
and every downstream consumer (long accumulation, subselection, reorder,
packetizers) becomes a plain gather/transpose.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.codec import unpack_jnp


class Vis(NamedTuple):
    """Integer visibilities, dense layout [nchan, ninput, ninput].

    ``real + 1j*imag`` is ``sum_t v_i conj(v_j)`` accumulated over however
    many spectra produced it (tracked externally via sequence headers, as in
    the reference's ``acc_len`` header field, corr_block.py:403).
    """
    real: jax.Array  # int32 [nchan, ninput, ninput]
    imag: jax.Array  # int32 [nchan, ninput, ninput]

    @property
    def nchan(self):
        return self.real.shape[0]

    @property
    def ninput(self):
        return self.real.shape[1]

    def __add__(self, other: "Vis") -> "Vis":
        return Vis(self.real + other.real, self.imag + other.imag)


def zero_vis(nchan: int, ninput: int, dtype=jnp.int32) -> Vis:
    z = jnp.zeros((nchan, ninput, ninput), dtype=dtype)
    return Vis(z, z)


#: Contraction engine: "bf16" multiplies on the MXU in bfloat16 with f32
#: accumulation and rounds the (exactly integer) result to int32; "int8"
#: uses a native s8xs8->s32 dot.  Both are bit-exact for 4-bit inputs; the
#: bf16 path is the fast one on current TPUs (XLA's int8 dot lowers to a
#: slow emulation on v5e), while int8 is kept for backends with native
#: int8 MXU support.  Exactness: inputs are in [-8,7] (exact in bf16),
#: per-plane products are in [-64,64], and every partial sum stays below
#: 2^24 for ntime <= 262144, far above any gulp size.
CORR_ENGINE = "bf16"
_MAX_EXACT_NTIME = (1 << 24) // 64


def _xcorr_planes(xr, xi, engine: str | None = None):
    """Correlate unpacked int8 planes [ntime, nchan, ninput].

    Returns int32 Vis.  x_i * conj(x_j) = (ar*br + ai*bi) + 1j(ai*br - ar*bi)
    summed over t; each term is one MXU-batched contraction over t.
    """
    engine = engine or CORR_ENGINE
    dn = (((0,), (0,)), ((1,), (1,)))
    if engine == "bf16":
        if xr.shape[0] > _MAX_EXACT_NTIME:
            raise ValueError(
                f"gulp of {xr.shape[0]} samples exceeds the exact-f32 "
                f"accumulation bound {_MAX_EXACT_NTIME}")
        ar = xr.astype(jnp.bfloat16)
        ai = xi.astype(jnp.bfloat16)

        def xc(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        # 3 matmuls, not 4: both cross terms come from ONE product —
        # C[c,i,j] = sum_t ar[t,c,i] ai[t,c,j] satisfies
        # V_im = C^T - C (the imaginary part is antisymmetric).
        vr = xc(ar, ar) + xc(ai, ai)
        c = xc(ar, ai)
        vi = jnp.swapaxes(c, 1, 2) - c
        return Vis(vr.astype(jnp.int32), vi.astype(jnp.int32))

    def xc(a, b):
        # [t, c, i] x [t, c, j] -> [c, i, j], contracting t, batching c.
        return jax.lax.dot_general(
            a, b, dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    vr = xc(xr, xr) + xc(xi, xi)
    vi = xc(xi, xr) - xc(xr, xi)
    return Vis(vr, vi)


def correlate_gulp(packed: jax.Array) -> Vis:
    """Correlate one gulp of packed 4+4-bit samples.

    Args:
      packed: uint8 [ntime, nchan, ninput] (the capture-ring data order,
        reference: corr_block.py:115-117).

    Returns:
      int32 Vis [nchan, ninput, ninput] integrated over the gulp.
    """
    xr, xi = unpack_jnp(packed)
    return _xcorr_planes(xr, xi)


def correlate_accumulate(packed: jax.Array, ntime_gulp: int,
                         acc: Vis | None = None) -> Vis:
    """Correlate-and-accumulate a block of ``k * ntime_gulp`` spectra.

    Mirrors the xGPU accumulate-then-dump usage (``bfXgpuKernel`` with the
    dump flag on the final gulp, reference: corr_block.py:445) as a
    ``lax.scan`` over gulps with an int32 carry; XLA keeps the carry on
    device so HBM traffic per gulp is one unpack + one matmul output add.

    Args:
      packed: uint8 [ntime, nchan, ninput] with ntime % ntime_gulp == 0.
      ntime_gulp: samples per inner matmul (t-dimension of the MXU
        contraction).  Larger gulps amortize more; 480 matches the
        reference's operating point.
      acc: optional carry-in from a previous call (for accumulations that
        span host-side input blocks).
    """
    ntime, nchan, ninput = packed.shape
    if ntime % ntime_gulp != 0:
        raise ValueError(f"ntime {ntime} not a multiple of gulp {ntime_gulp}")
    ngulp = ntime // ntime_gulp
    if acc is None:
        acc = zero_vis(nchan, ninput)
    if ngulp == 1:
        return acc + correlate_gulp(packed)
    chunks = packed.reshape(ngulp, ntime_gulp, nchan, ninput)

    def step(carry, chunk):
        return carry + correlate_gulp(chunk), None

    acc, _ = jax.lax.scan(step, acc, chunks)
    return acc


@functools.partial(jax.jit, static_argnames=("ntime_gulp",))
def correlate_accumulate_jit(packed: jax.Array, ntime_gulp: int) -> Vis:
    return correlate_accumulate(packed, ntime_gulp)


def vis_to_numpy_complex(vis: Vis):
    """Dense complex128 view for verification (exact: int32 fits float64)."""
    import numpy as np

    return (np.asarray(vis.real, dtype=np.int64)
            + 1j * np.asarray(vis.imag, dtype=np.int64)).astype(np.complex128)


def autocorr_spectra(vis_dense, nstand: int, npol: int = 2):
    """Per-stand autocorrelation spectra from a dense visibility cube
    [nchan, ninput, ninput] -> real f32 [nstand, npol, nchan].

    The single home for the input-ordering assumption
    (input = stand*npol + pol): both the write_autos sink and the
    control-side quick-look plots call this."""
    import numpy as np

    v = np.asarray(vis_dense)
    nchan = v.shape[0]
    nin = nstand * npol
    diag = np.real(v[:, np.arange(nin), np.arange(nin)])
    return diag.T.reshape(nstand, npol, nchan).astype(np.float32)


def long_accumulate(vis_new: Vis, vis_acc: Vis) -> Vis:
    """One CorrAcc step: int32 add of a fast dump into the slow accumulator
    (replaces the JIT'd ``BFMap("a += b")`` at
    reference: blocks/corr_acc_block.py:304-306)."""
    return vis_acc + vis_new
