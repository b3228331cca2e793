"""Error budget for the bf16 channelizer path.

The production FX default runs the channelizer DFT as single-pass bf16
MXU matmuls (pfb_precision="bf16").  These tests quantify that choice on
realistic scenes — band-limited noise and a strong tone over a weak
noise floor — at the production channel count, against a float64
reference (ops.pfb.pfb_reference_np):

- bf16 numerics are exercised EXPLICITLY via the XLA planes path's
  bfloat16 casts (interpret-mode Pallas computes in f32, so the fused
  kernel cannot measure its own TPU rounding; the planes path performs
  the identical single-pass [L x nchan] matmul contraction and the
  fused kernel is separately tested bitwise-equal to it in
  test_pallas_pfb.py);
- the budget: bf16 spectral error must sit far below the 4-bit
  requantizer's own step, so the packed products the correlator
  consumes are indistinguishable — the error class of a fixed-point
  FPGA F-engine's own coefficient rounding (the reference's F-engine,
  SURVEY.md section 0).

Measured on these scenes: high ~3e-7 relative, bf16 ~2e-3 relative and
~2e-3 of peak — ~70x below one quantizer LSB at full scale.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from caltech_bifrost_dsp_tpu.ops import pfb

NCHAN, NTAP, NSPEC, NINPUT = 192, 4, 64, 8
L = 2 * NCHAN
N = (NSPEC + NTAP - 1) * L


def _bandlimited(rng):
    """Sum of random-phase tones confined to channels 40..80."""
    t = np.arange(N)
    x = np.zeros([N, NINPUT], np.float32)
    for k in range(40, 80):
        amp = rng.uniform(0.5, 1.0, NINPUT)
        ph = rng.uniform(0, 2 * np.pi, NINPUT)
        x += (amp * np.cos(2 * np.pi * (k / L) * t[:, None] + ph)
              ).astype(np.float32)
    return x * (3.0 / x.std())


def _strong_tone(rng):
    """Near-full-scale tone in channel 100 over a -58 dB noise floor."""
    t = np.arange(N)
    x = (0.05 * rng.standard_normal([N, NINPUT])).astype(np.float32)
    return x + 40.0 * np.cos(2 * np.pi * (100 / L) * t[:, None]
                             ).astype(np.float32)


def _spectra(x, precision):
    w = pfb.pfb_window(NCHAN, NTAP)
    re, im = pfb.pfb_channelize_planes_imajor(
        jnp.asarray(x), jnp.asarray(w), NCHAN, NTAP, precision=precision)
    return np.asarray(re) + 1j * np.asarray(im)  # [ninput, nspec, nchan]


def _reference(x):
    w = pfb.pfb_window(NCHAN, NTAP)
    ref = pfb.pfb_reference_np(x.astype(np.float64),
                               w.astype(np.float64), NCHAN, NTAP)
    return np.moveaxis(ref, 2, 0)


@pytest.mark.parametrize("scene", ["bandlimited", "tone"])
def test_bf16_error_budget(rng, scene):
    x = _bandlimited(rng) if scene == "bandlimited" else _strong_tone(rng)
    ref = _reference(x)
    peak = np.abs(ref).max()

    hi = _spectra(x, "high")
    rel_hi = np.linalg.norm(hi - ref) / np.linalg.norm(ref)
    assert rel_hi < 1e-5, rel_hi

    lo = _spectra(x, "bf16")
    rel_lo = np.linalg.norm(lo - ref) / np.linalg.norm(ref)
    assert rel_lo < 1e-2, rel_lo
    # the budget that matters downstream: worst-case bf16 error vs the
    # 4-bit quantizer step with the peak mapped to full scale (+-7).
    # Half a step would be the first level where packed products can
    # systematically differ; bf16 must sit far below it.
    quant_step = peak / 7.0
    worst = np.abs(lo - ref).max()
    assert worst < 0.1 * quant_step, (worst, quant_step)


def test_bf16_packed_products_indistinguishable(rng):
    """With the peak at quantizer full scale, bf16 and float64 spectra
    must quantize to (almost) identical packed products: >= 99.5%
    byte-identical, differing nibbles off by at most 1 LSB."""
    x = _strong_tone(rng)
    ref = _reference(x)
    lo = _spectra(x, "bf16")
    scale = 7.0 / np.abs(ref).max()

    def q(z):
        r = np.clip(np.round(z.real * scale), -8, 7).astype(np.int8)
        i = np.clip(np.round(z.imag * scale), -8, 7).astype(np.int8)
        return r, i

    rr, ri = q(ref)
    lr, li = q(lo)
    same = np.mean((rr == lr) & (ri == li))
    assert same > 0.995, same
    assert np.abs(rr.astype(int) - lr).max() <= 1
    assert np.abs(ri.astype(int) - li).max() <= 1
