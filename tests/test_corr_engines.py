"""Both correlator contraction engines must produce identical int32
results (the bf16 path's exactness claim)."""

import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu.ops import correlate
from caltech_bifrost_dsp_tpu.utils.codec import unpack_jnp
from caltech_bifrost_dsp_tpu.verification import golden


def test_engines_agree_exactly():
    block = next(golden.generate_input_blocks(480, 8, 8, 2, 480))
    packed = jnp.asarray(block.reshape(480, 8, 16))
    xr, xi = unpack_jnp(packed)
    v_bf = correlate._xcorr_planes(xr, xi, engine="bf16")
    v_i8 = correlate._xcorr_planes(xr, xi, engine="int8")
    np.testing.assert_array_equal(np.asarray(v_bf.real),
                                  np.asarray(v_i8.real))
    np.testing.assert_array_equal(np.asarray(v_bf.imag),
                                  np.asarray(v_i8.imag))


def test_bf16_engine_extreme_values_exact():
    """Worst case: all samples at the +-extremes for a long gulp."""
    ntime = 2400
    re = np.full([ntime, 2, 4], -8, np.int8)
    im = np.full([ntime, 2, 4], 7, np.int8)
    v = correlate._xcorr_planes(jnp.asarray(re), jnp.asarray(im),
                                engine="bf16")
    # v[c,i,j] = sum (a * conj(a)) = ntime * (64 + 49) real, 0 imag
    np.testing.assert_array_equal(np.asarray(v.real),
                                  ntime * (64 + 49))
    np.testing.assert_array_equal(np.asarray(v.imag), 0)


def test_gulp_bound_guard():
    import pytest

    re = jnp.zeros([correlate._MAX_EXACT_NTIME + 1, 1, 2], jnp.int8)
    with pytest.raises(ValueError):
        correlate._xcorr_planes(re, re, engine="bf16")
