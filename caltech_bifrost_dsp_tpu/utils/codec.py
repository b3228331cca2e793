"""4+4-bit complex codec.

Wire samples are one byte per complex value: the high nibble is the real
part, the low nibble the imaginary part, each a 4-bit two's-complement
integer in [-8, 7].  Sign convention matches the reference's CPU unpack
(reference: pipeline/lwa352_pipeline/blocks/corr_block.py:270-275 and
pipeline/verification/make_golden_inputs.py:118-122):

    dr = (d >> 4); dr[dr > 7] -= 16
    di = (d & 0xf); di[di > 7] -= 16

Both numpy (host-side, exact spec) and jnp (device-side, jit-safe)
implementations are provided.  The 4-bit sign extension uses the branch-free
identity ``((v ^ 8) - 8)`` over ``v in [0, 15]``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def unpack_np(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """uint8 packed -> (real, imag) int8 arrays of the same shape."""
    p = np.asarray(packed, dtype=np.uint8)
    re = ((p >> 4).astype(np.int8) ^ 8) - 8
    im = ((p & 0xF).astype(np.int8) ^ 8) - 8
    return re, im


def unpack_complex_np(packed: np.ndarray) -> np.ndarray:
    """uint8 packed -> complex64 array (convenience for reference checks)."""
    re, im = unpack_np(packed)
    return re.astype(np.float32) + 1j * im.astype(np.float32)


def pack_np(re: np.ndarray, im: np.ndarray) -> np.ndarray:
    """(real, imag) ints in [-8, 7] -> uint8 packed."""
    re = np.asarray(re)
    im = np.asarray(im)
    if re.min(initial=0) < -8 or re.max(initial=0) > 7:
        raise ValueError("real part out of 4-bit range [-8, 7]")
    if im.min(initial=0) < -8 or im.max(initial=0) > 7:
        raise ValueError("imag part out of 4-bit range [-8, 7]")
    return (((re.astype(np.int64) & 0xF) << 4)
            | (im.astype(np.int64) & 0xF)).astype(np.uint8)


def unpack_jnp(packed) -> tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 packed -> (real, imag) int8, jit-safe device version.

    The arithmetic runs in uint8/int8 on the VPU; no widening needed.
    """
    p = packed.astype(jnp.uint8)
    re = ((p >> 4).astype(jnp.int8) ^ 8) - 8
    im = ((p & 0xF).astype(jnp.int8) ^ 8) - 8
    return re, im


def pack_jnp(re, im) -> jnp.ndarray:
    """(real, imag) int arrays in [-8, 7] -> uint8 packed, jit-safe."""
    r = re.astype(jnp.int32) & 0xF
    i = im.astype(jnp.int32) & 0xF
    return ((r << 4) | i).astype(jnp.uint8)
