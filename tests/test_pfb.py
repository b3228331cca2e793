import numpy as np
import jax.numpy as jnp

from caltech_bifrost_dsp_tpu.ops import pfb
from caltech_bifrost_dsp_tpu.utils import codec

NCHAN, NTAP = 64, 4


def test_pfb_matches_numpy_reference(rng):
    nspec = 6
    ntime = pfb.required_ntime(nspec, NCHAN, NTAP)
    x = rng.standard_normal([ntime, 3]).astype(np.float32)
    win = pfb.pfb_window(NCHAN, NTAP)
    got = np.asarray(pfb.pfb_channelize(jnp.asarray(x), jnp.asarray(win),
                                        NCHAN, NTAP))
    want = pfb.pfb_reference_np(x, win, NCHAN, NTAP)
    assert got.shape == (nspec, NCHAN, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pfb_tone_lands_in_right_channel():
    nspec = 8
    ntime = pfb.required_ntime(nspec, NCHAN, NTAP)
    k = 17  # channel index
    fs = 1.0
    t = np.arange(ntime)
    x = np.cos(2 * np.pi * (k / (2 * NCHAN)) * fs * t).astype(np.float32)
    win = pfb.pfb_window(NCHAN, NTAP)
    spec = np.asarray(pfb.pfb_channelize(jnp.asarray(x[:, None]),
                                         jnp.asarray(win), NCHAN, NTAP))
    power = (np.abs(spec[:, :, 0]) ** 2).mean(axis=0)
    assert power.argmax() == k
    # channel isolation: neighbors at least 30 dB down beyond +-1 chan
    others = np.delete(power, [k - 1, k, k + 1])
    assert others.max() < power[k] * 1e-3


def test_matmul_dft_matches_fft(rng):
    nspec = 4
    ntime = pfb.required_ntime(nspec, NCHAN, NTAP)
    x = rng.standard_normal([ntime, 3]).astype(np.float32)
    win = pfb.pfb_window(NCHAN, NTAP)
    a = np.asarray(pfb.pfb_channelize(jnp.asarray(x), jnp.asarray(win),
                                      NCHAN, NTAP, fft_impl="fft"))
    b = np.asarray(pfb.pfb_channelize(jnp.asarray(x), jnp.asarray(win),
                                      NCHAN, NTAP, fft_impl="matmul"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-3)


def test_boxcar_single_tap_is_plain_fft(rng):
    """ntap=1 boxcar PFB must reduce to a blockwise rFFT."""
    nspec = 4
    ntime = pfb.required_ntime(nspec, NCHAN, 1)
    x = rng.standard_normal([ntime, 1]).astype(np.float32)
    win = pfb.pfb_window(NCHAN, 1, kind="boxcar")
    got = np.asarray(pfb.pfb_channelize(jnp.asarray(x), jnp.asarray(win),
                                        NCHAN, 1))
    frames = x.reshape(nspec, 2 * NCHAN) * win.reshape(1, 2 * NCHAN)
    want = np.fft.rfft(frames, axis=1)[:, :NCHAN]
    np.testing.assert_allclose(got[..., 0], want, rtol=1e-4, atol=1e-4)


def test_upchannelize_blockwise_fft(rng):
    nup = 8
    x = (rng.standard_normal([32, 3]) + 1j * rng.standard_normal([32, 3])
         ).astype(np.complex64)
    got = np.asarray(pfb.upchannelize(jnp.asarray(x), nup))
    want = np.fft.fftshift(np.fft.fft(x.reshape(4, nup, 3), axis=1), axes=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_planes_pfb_matches_complex(rng):
    nspec = 4
    ntime = pfb.required_ntime(nspec, NCHAN, NTAP)
    x = rng.standard_normal([ntime, 3]).astype(np.float32)
    win = pfb.pfb_window(NCHAN, NTAP)
    z = np.asarray(pfb.pfb_channelize(jnp.asarray(x), jnp.asarray(win),
                                      NCHAN, NTAP))
    re, im = pfb.pfb_channelize_planes(jnp.asarray(x), jnp.asarray(win),
                                       NCHAN, NTAP)
    np.testing.assert_allclose(np.asarray(re), z.real, rtol=1e-4,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(im), z.imag, rtol=1e-4,
                               atol=1e-3)
    # packed requant agrees between the two paths
    a = np.asarray(pfb.quantize_4bit(jnp.asarray(z), 0.5))
    b = np.asarray(pfb.quantize_4bit_planes(re, im, 0.5))
    assert (a == b).mean() > 0.999  # rounding ties at f32 epsilon


def test_upchannelize_matmul_matches_fft(rng):
    nup = 8
    x = (rng.standard_normal([32, 3]) + 1j * rng.standard_normal([32, 3])
         ).astype(np.complex64)
    a = np.asarray(pfb.upchannelize(jnp.asarray(x), nup, fft_impl="fft"))
    b = np.asarray(pfb.upchannelize(jnp.asarray(x), nup,
                                    fft_impl="matmul"))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_quantize_4bit_roundtrip_small_ints():
    z = np.array([[1 + 2j, -8 - 8j, 7 + 7j, 0.4 - 0.4j]], dtype=np.complex64)
    packed = np.asarray(pfb.quantize_4bit(jnp.asarray(z)))
    re, im = codec.unpack_np(packed)
    np.testing.assert_array_equal(re[0], [1, -8, 7, 0])
    np.testing.assert_array_equal(im[0], [2, -8, 7, -0])


def test_quantize_per_channel_gains():
    z = np.ones([2, 4, 3], dtype=np.complex64) * (2 + 2j)
    scale = np.array([0.5, 1.0, 2.0, 3.0], np.float32)
    packed = np.asarray(pfb.quantize_4bit(jnp.asarray(z), scale))
    re, _ = codec.unpack_np(packed)
    np.testing.assert_array_equal(re[0, :, 0], [1, 2, 4, 6])


def test_quantize_saturates():
    z = np.array([[100 + 100j, -100 - 100j]], dtype=np.complex64)
    packed = np.asarray(pfb.quantize_4bit(jnp.asarray(z)))
    re, im = codec.unpack_np(packed)
    np.testing.assert_array_equal(re[0], [7, -8])
    np.testing.assert_array_equal(im[0], [7, -8])


def test_factored_rdft_matches_fft_fengine_scale(rng):
    """The two-stage Cooley-Tukey matmul DFT must match numpy's rfft at
    the F-engine operating point (nchan=4096, L=8192) and at the
    per-pipeline point (nchan=192, L=384)."""
    import jax.numpy as jnp

    for nchan in (192, 4096):
        L = 2 * nchan
        # factored only at F-engine scale; the pipeline point (L=384)
        # is faster as a single direct MXU matmul
        assert (pfb._dft_factors(L) is not None) == (nchan == 4096)
        x = rng.standard_normal([3, L]).astype(np.float32)
        re, im = pfb._rdft_apply(jnp.asarray(x), nchan)
        want = np.fft.rfft(x, axis=1)[:, :nchan]
        scale = np.abs(want).max()
        np.testing.assert_allclose(np.asarray(re), want.real,
                                   atol=2e-5 * scale)
        np.testing.assert_allclose(np.asarray(im), want.imag,
                                   atol=2e-5 * scale)


def test_pfb_matmul_fengine_scale_matches_reference(rng):
    """Full critically-sampled PFB at 4096 channels (matmul path) vs the
    numpy reference."""
    nchan, ntap, nspec, ninput = 4096, 4, 2, 2
    L = 2 * nchan
    x = rng.standard_normal([(nspec + ntap - 1) * L, ninput]) \
        .astype(np.float32)
    w = pfb.pfb_window(nchan, ntap)
    got = np.asarray(pfb.pfb_channelize(x, w, nchan, ntap,
                                        fft_impl="matmul"))
    want = pfb.pfb_reference_np(x, w, nchan, ntap)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got.real, want.real, atol=3e-5 * scale)
    np.testing.assert_allclose(got.imag, want.imag, atol=3e-5 * scale)


def test_imajor_folded_window_matches_reference(rng):
    """The window-folded matmul PFB (no FIR materialization) must match
    the numpy reference; the bf16 fast mode within its coarser bound."""
    import jax.numpy as jnp

    nchan, ntap, nspec, ninput = 64, 4, 5, 3
    L = 2 * nchan
    x = rng.standard_normal([(nspec + ntap - 1) * L, ninput]) \
        .astype(np.float32)
    w = pfb.pfb_window(nchan, ntap)
    want = pfb.pfb_reference_np(x, w, nchan, ntap)  # [nspec, nchan, nin]
    scale = np.abs(want).max()
    re, im = pfb.pfb_channelize_planes_imajor(jnp.asarray(x),
                                              jnp.asarray(w), nchan, ntap)
    got = np.asarray(re) + 1j * np.asarray(im)      # [nin, nspec, nchan]
    got = got.transpose(1, 2, 0)
    np.testing.assert_allclose(got.real, want.real, atol=3e-5 * scale)
    np.testing.assert_allclose(got.imag, want.imag, atol=3e-5 * scale)
    re, im = pfb.pfb_channelize_planes_imajor(
        jnp.asarray(x), jnp.asarray(w), nchan, ntap, precision="bf16")
    got = (np.asarray(re) + 1j * np.asarray(im)).transpose(1, 2, 0)
    np.testing.assert_allclose(got.real, want.real, atol=3e-2 * scale)
    np.testing.assert_allclose(got.imag, want.imag, atol=3e-2 * scale)
