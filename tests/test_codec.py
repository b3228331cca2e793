import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu.utils import codec


def reference_unpack(d):
    """The reference's CPU unpack, verbatim semantics
    (reference: corr_block.py:270-275)."""
    d = np.asarray(d, dtype=np.uint8)
    dr = np.array(d >> 4, dtype=np.int8)
    dr[dr > 7] -= 16
    di = np.array(d & 0xF, dtype=np.int8)
    di[di > 7] -= 16
    return dr, di


def test_unpack_np_matches_reference_all_bytes():
    allb = np.arange(256, dtype=np.uint8)
    r_ref, i_ref = reference_unpack(allb)
    r, i = codec.unpack_np(allb)
    np.testing.assert_array_equal(r, r_ref)
    np.testing.assert_array_equal(i, i_ref)


def test_unpack_jnp_matches_np():
    allb = np.arange(256, dtype=np.uint8)
    r_np, i_np = codec.unpack_np(allb)
    r_j, i_j = codec.unpack_jnp(jnp.asarray(allb))
    np.testing.assert_array_equal(np.asarray(r_j), r_np)
    np.testing.assert_array_equal(np.asarray(i_j), i_np)


def test_pack_roundtrip():
    allb = np.arange(256, dtype=np.uint8)
    r, i = codec.unpack_np(allb)
    np.testing.assert_array_equal(codec.pack_np(r, i), allb)
    np.testing.assert_array_equal(np.asarray(codec.pack_jnp(
        jnp.asarray(r), jnp.asarray(i))), allb)


def test_unpack_complex():
    z = codec.unpack_complex_np(np.array([0x00, 0x7F, 0x8F, 0x18], np.uint8))
    np.testing.assert_array_equal(z, [0 + 0j, 7 - 1j, -8 - 1j, 1 - 8j])
