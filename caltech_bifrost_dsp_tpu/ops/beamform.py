"""Multi-beam voltage beamforming + integrated power beams.

Replaces the reference's ``bfBeamform*`` CUDA/cuBLAS kernels (algorithm
prototype at reference: pipeline/bf_src/cublas_beamform.cu; production call
sites at reference: blocks/beamform_block.py:449 and
blocks/beamform_sum_beams_block.py:245) with per-channel batched matmuls on
the MXU plus a fused power/pol-pair reduction.

Conventions (from the cuBLAS prototype, cublas_beamform.cu:248-276):
the beamform product applies *no* conjugation —

    bf[c, b, t] = sum_i  w[c, b, i] * x[t, c, i]

with w complex64 gains [chan, beam, input] (reference:
beamform_block.py:230-241) and x the unpacked 4+4-bit voltages.  Beam pairs
(2b, 2b+1) act as X/Y polarizations of dual-pol beam b; the power stage
(trans_output_and_sum, cublas_beamform.cu:46-79) integrates ``ntime_sum``
samples into [XX, YY, Re(XY*), Im(XY*)].

f32 matmuls at HIGH precision (3-pass bf16 decomposition, ~1e-6 relative
error) keep the result comfortably inside the reference test gate of
``np.isclose(rtol=1e-4)`` (reference: tests/beamformer/beamformer_test.py:106-109).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.codec import unpack_jnp


class BeamGains(NamedTuple):
    """Complex gains as f32 planes [nchan, nbeam, ninput]."""
    real: jax.Array
    imag: jax.Array

    @classmethod
    def from_complex(cls, g) -> "BeamGains":
        import numpy as np

        g = np.asarray(g)
        return cls(jnp.asarray(np.real(g), dtype=jnp.float32),
                   jnp.asarray(np.imag(g), dtype=jnp.float32))


class BeamVoltages(NamedTuple):
    """cf32 beams as planes [nchan, nbeam, ntime]
    (the bfBeamformRun output order, reference: beamform_block.py:449 and
    tests/beamformer/beamformer_kernel_test.py:46-60)."""
    real: jax.Array
    imag: jax.Array


#: Beamform engine: "bf16x2" splits each f32 gain into a bf16 hi+lo pair
#: and runs two single-pass bf16 MXU matmuls per product (voltages are
#: small ints, exact in bf16), giving ~2^-16 relative accuracy — well
#: inside the reference's rtol=1e-4 gate.  "f32" is the HIGHEST-precision
#: multi-pass path — measured *faster* on v5e at the production shapes
#: (the bf16x2 operand conversions dominate its matmul savings), so it is
#: the default; bf16x2 remains available for wider-beam operating points.
BEAMFORM_ENGINE = "f32"

_BM_DN = (((2,), (2,)), ((0,), (1,)))


def _split_bf16x2(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def beamform_gulp(packed: jax.Array, gains: BeamGains,
                  engine: str | None = None) -> BeamVoltages:
    """Form voltage beams for one gulp.

    Args:
      packed: uint8 [ntime, nchan, ninput].
      gains: f32 planes [nchan, nbeam, ninput].

    Returns:
      BeamVoltages f32 [nchan, nbeam, ntime].
    """
    engine = engine or BEAMFORM_ENGINE
    xr8, xi8 = unpack_jnp(packed)

    if engine == "bf16x2":
        xr = xr8.astype(jnp.bfloat16)
        xi = xi8.astype(jnp.bfloat16)
        gr_hi, gr_lo = _split_bf16x2(gains.real)
        gi_hi, gi_lo = _split_bf16x2(gains.imag)

        def bm2(hi, lo, x):
            # [c, b, i] x [t, c, i] -> [c, b, t], contracting i, batch c.
            return (jax.lax.dot_general(
                        hi, x, dimension_numbers=_BM_DN,
                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        lo, x, dimension_numbers=_BM_DN,
                        preferred_element_type=jnp.float32))

        br = bm2(gr_hi, gr_lo, xr) - bm2(gi_hi, gi_lo, xi)
        bi = bm2(gr_hi, gr_lo, xi) + bm2(gi_hi, gi_lo, xr)
        return BeamVoltages(br, bi)

    xr = xr8.astype(jnp.float32)
    xi = xi8.astype(jnp.float32)

    def bm(w, x):
        # HIGH = 3-pass bf16 decomposition: ~1e-6 relative error (the
        # reference gate is 1e-4) at half the MXU passes of HIGHEST
        return jax.lax.dot_general(
            w, x, dimension_numbers=_BM_DN,
            precision=jax.lax.Precision.HIGH,
            preferred_element_type=jnp.float32)

    br = bm(gains.real, xr) - bm(gains.imag, xi)
    bi = bm(gains.real, xi) + bm(gains.imag, xr)
    return BeamVoltages(br, bi)


def beam_power_sum(bf: BeamVoltages, ntime_sum: int) -> jax.Array:
    """Integrated dual-pol beam powers.

    Treats beam pairs (2b, 2b+1) as X/Y pols and integrates ntime_sum
    samples, reproducing trans_output_and_sum semantics
    (reference: cublas_beamform.cu:46-79; output layout
    [beam, time, chan, 4] from blocks/beamform_sum_beams_block.py:220).

    Args:
      bf: f32 planes [nchan, nbeam, ntime], nbeam even,
        ntime % ntime_sum == 0.

    Returns:
      f32 [nbeam//2, ntime//ntime_sum, nchan, 4] with the last axis
      [XX, YY, Re(X conj(Y)), Im(X conj(Y))].
    """
    nchan, nbeam, ntime = bf.real.shape
    if nbeam % 2 or ntime % ntime_sum:
        raise ValueError("nbeam must be even and ntime a multiple of "
                         "ntime_sum")
    nblock = ntime // ntime_sum

    def split(z):
        # [c, 2B, t] -> X/Y [c, B, nblock, ntime_sum]
        z = z.reshape(nchan, nbeam // 2, 2, nblock, ntime_sum)
        return z[:, :, 0], z[:, :, 1]

    xr, yr = split(bf.real)
    xi, yi = split(bf.imag)
    xx = jnp.sum(xr * xr + xi * xi, axis=-1)
    yy = jnp.sum(yr * yr + yi * yi, axis=-1)
    xy_r = jnp.sum(xr * yr + xi * yi, axis=-1)
    xy_i = jnp.sum(xi * yr - xr * yi, axis=-1)
    out = jnp.stack([xx, yy, xy_r, xy_i], axis=-1)  # [c, B, nblock, 4]
    return jnp.transpose(out, (1, 2, 0, 3))         # [B, nblock, c, 4]


def beam_power_single(bf: BeamVoltages, beam: int, ntime_sum: int
                      ) -> jax.Array:
    """Power integration for one selected dual-pol beam
    (``bfBeamformIntegrateSingleBeam``,
    reference: blocks/beamform_sum_single_beam_block.py:114).

    Returns f32 [ntime//ntime_sum, nchan, 4].
    """
    sel = BeamVoltages(
        jax.lax.dynamic_slice_in_dim(bf.real, 2 * beam, 2, axis=1),
        jax.lax.dynamic_slice_in_dim(bf.imag, 2 * beam, 2, axis=1))
    return beam_power_sum(sel, ntime_sum)[0]


def vlbi_voltage_select(bf: BeamVoltages, nbeam_out: int = 2) -> jax.Array:
    """Downselect the first ``nbeam_out`` single-pol beams (the dual-pol
    VLBI beam 0) and transpose chan x beam x time -> time x chan x beam
    interleaved re/im, as done on-GPU before D2H in the reference
    (reference: blocks/beamform_vlbi_output_block.py:260-264).

    Returns f32 [ntime, nchan, nbeam_out, 2].
    """
    sub_r = bf.real[:, :nbeam_out]  # [c, b, t]
    sub_i = bf.imag[:, :nbeam_out]
    z = jnp.stack([sub_r, sub_i], axis=-1)        # [c, b, t, 2]
    return jnp.transpose(z, (2, 0, 1, 3))         # [t, c, b, 2]


def delays_to_gains(freqs_hz, delays_ns, amps, cal_gains) -> "BeamGains":
    """Coefficient protocol: delays (ns) + per-input amplitudes -> complex
    gains, multiplied by calibration gains.

    Reproduces ``phases = exp(2j*pi*f*tau)``; ``gains = amps * phases * cal``
    (reference: blocks/beamform_block.py:343-349).

    Args:
      freqs_hz: [nchan] channel center frequencies.
      delays_ns: [nbeam, ninput] geometric delays in ns.
      amps: [nbeam, ninput] amplitudes.
      cal_gains: complex [nchan, nbeam, ninput] calibration gains.

    Returns:
      BeamGains planes [nchan, nbeam, ninput].
    """
    import numpy as np

    freqs_hz = np.asarray(freqs_hz, dtype=np.float64)
    phases = np.exp(1j * 2 * np.pi * freqs_hz[:, None, None]
                    * np.asarray(delays_ns)[None] * 1e-9)
    g = np.asarray(amps)[None] * phases * np.asarray(cal_gains)
    return BeamGains.from_complex(g.astype(np.complex64))
