"""bf16x2 beamform engine accuracy vs the f32 HIGHEST path and vs
float64 ground truth (must sit well inside the reference rtol=1e-4 gate).
"""

import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu.ops import beamform as bf
from caltech_bifrost_dsp_tpu.utils import codec

NTIME, NCHAN, NINPUT, NBEAM = 480, 8, 32, 6


def _data(rng):
    packed = rng.randint(0, 255, [NTIME, NCHAN, NINPUT]).astype(np.uint8)
    gains = (rng.standard_normal([NCHAN, NBEAM, NINPUT])
             + 1j * rng.standard_normal([NCHAN, NBEAM, NINPUT])
             ).astype(np.complex64)
    return packed, gains


def _f64(packed, gains):
    x = codec.unpack_complex_np(packed).astype(np.complex128)
    return np.einsum("cbi,tci->cbt", gains.astype(np.complex128), x)


def test_bf16x2_accuracy_vs_f64(rng):
    packed, gains = _data(rng)
    g = bf.BeamGains.from_complex(gains)
    out = bf.beamform_gulp(jnp.asarray(packed), g, engine="bf16x2")
    z = np.asarray(out.real) + 1j * np.asarray(out.imag)
    want = _f64(packed, gains)
    err = np.abs(z - want) / (np.abs(want) + 1e-3)
    # comfortably inside the reference's rtol=1e-4 comparator
    assert np.median(err) < 2e-5
    assert np.percentile(err, 99.9) < 1e-4


def test_engines_agree(rng):
    packed, gains = _data(rng)
    g = bf.BeamGains.from_complex(gains)
    a = bf.beamform_gulp(jnp.asarray(packed), g, engine="bf16x2")
    b = bf.beamform_gulp(jnp.asarray(packed), g, engine="f32")
    np.testing.assert_allclose(np.asarray(a.real), np.asarray(b.real),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(a.imag), np.asarray(b.imag),
                               rtol=1e-4, atol=1e-2)
