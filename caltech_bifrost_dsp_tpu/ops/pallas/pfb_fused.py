"""Pallas TPU kernel: fused PFB FIR + real-DFT + 4-bit requantization.

The XLA PFB pipeline materializes the windowed-FIR intermediate and the
(re, im) spectral planes in HBM (3x the input's footprint of round-trip
traffic); measured on TPU that chain costs ~63 ms of the 100 ms
real-time budget while the correlator+beamformer need only ~8 ms.  This
kernel streams input slabs HBM->VMEM once, applies the ntap-deep FIR on
the VPU, runs the [L, nchan] DFT matmuls on the MXU and emits the final
packed 4+4-bit bytes — the only HBM writes are the 8x-smaller product.

Layout: input-major.  x_t is [ninput, ntime] f32 (the driver's
[ntime, ninput] stream transposed once by XLA); output is packed uint8
[ninput, nspec, nchan], which :func:`..pfb.quantize_4bit_planes_imajor`
-style callers transpose (bytes only) to the correlator's
[nspec, nchan, ninput].

Grid: (input tiles, spectra tiles).  Each instance DMAs its
(TI, (TS + ntap - 1) * L) slab — spectra tiles overlap by the (ntap-1)
FIR history, which block-index ``BlockSpec`` mappings cannot express,
hence the manual double-buffered async copy (same pattern as
:mod:`.corr_rows`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _choose_ts(nspec: int, cap: int = 128) -> int | None:
    """Largest spectra-tile size <= cap that divides nspec and keeps
    f32 sublane alignment (multiple of 8)."""
    for ts in range(min(cap, nspec), 7, -1):
        if nspec % ts == 0 and ts % 8 == 0:
            return ts
    return None


def _choose_ti(ninput: int, cap: int = 8) -> int:
    """Largest input-tile size <= cap dividing ninput (test shapes can
    be narrower than a full sublane; Mosaic pads)."""
    for ti in range(min(cap, ninput), 0, -1):
        if ninput % ti == 0:
            return ti
    return 1


def _default_tiles(x_dtype, nspec: int, ninput: int,
                   factored: bool) -> tuple[int | None, int]:
    """(ts, ti) policy per input dtype.

    int8 input slabs are 4x smaller in VMEM, so the input tile grows to
    a full int8 sublane tile (32) — which also keeps the strided slab
    DMA on int8 tiling boundaries — while the spectra tile shrinks to
    hold the f32 FIR intermediate at the same footprint."""
    if factored:
        return _choose_ts(nspec, cap=8), _choose_ti(ninput)
    if x_dtype == jnp.int8:
        # measured fastest at ti=32/ts=120 (10.44 ms harness vs 10.57
        # at ts=40); the ~22 MB of live f32 intermediates ride on the
        # explicit 64 MB vmem budget
        ti = _choose_ti(ninput, cap=32)
        return _choose_ts(nspec, cap=120), ti
    return _choose_ts(nspec, cap=128), _choose_ti(ninput)


def tiling_viable(nspec: int, ninput: int, nchan: int = 0) -> bool:
    """Whether the fused kernel can tile these dimensions (the factored
    F-engine-scale branch caps the spectra tile at 8)."""
    from ..pfb import _dft_factors

    cap = 8 if (nchan and _dft_factors(2 * nchan) is not None) else 128
    return _choose_ts(nspec, cap=cap) is not None and ninput >= 1


def _dot_3pass(a, b, dn):
    """f32 x f32 matmul as the bf16_3x decomposition (a_hi@b_hi +
    a_hi@b_lo + a_lo@b_hi) — XLA's Precision.HIGH, which Mosaic's
    dot_general does not accept directly (only DEFAULT/HIGHEST)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(x, y, dn,
                                   preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _make_dot(fast: bool):
    if fast:
        def dot(a, b, dn):
            return jax.lax.dot_general(
                a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), dn,
                preferred_element_type=jnp.float32)
        return dot
    return _dot_3pass


def _make_kernel(ntap: int, L: int, nchan: int, ts: int, ti: int,
                 n_s: int, fast: bool, fir_impl: str = "frames",
                 nchunk: int = 1):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    slab = (ts + ntap - 1) * L
    assert ts % nchunk == 0
    tsc = ts // nchunk

    def kernel(xt_ref, w_ref, cm_ref, scale_ref, out_ref, xbuf, sems):
        i = pl.program_id(0)
        s = pl.program_id(1)

        def get_dma(slot, s_idx):
            return pltpu.make_async_copy(
                xt_ref.at[pl.ds(i * ti, ti),
                          pl.ds(s_idx * ts * L, slab)],
                xbuf.at[slot], sems.at[slot])

        # double-buffer across the spectra-tile axis: tile s+1's slab
        # streams in while tile s computes (grid iterates s fastest)
        slot = s % 2

        @pl.when(s == 0)
        def _():
            get_dma(0, s).start()

        @pl.when(s + 1 < n_s)
        def _():
            get_dma((s + 1) % 2, s + 1).start()

        get_dma(slot, s).wait()
        # ONE whole-slab convert (no-op for f32): converting per tap
        # slice instead costs ntap sliced int8 relayouts, measured
        # slower than the f32 input path outright
        ff = xbuf[slot].astype(jnp.float32)
        dot = _make_dot(fast)
        dn2 = (((1,), (0,)), ((), ()))

        def fir_chunk(c):
            """FIR rows [c*tsc, (c+1)*tsc) of the tile -> [ti*tsc, L].
            Row-chunking is bit-identical: each output row's FIR and
            its [L]x[L, 2*nchan] dot are independent of other rows."""
            base = c * tsc
            if fir_impl == "flat":
                # lane-aligned FIR: tap-k's view of the FLAT slab
                # starts at lane offset (base + k)*L (L is a 128
                # multiple at the production point), so every slice is
                # lane-tile aligned and the window arrives pre-tiled
                fir = ff[:, base * L:(base + tsc) * L] * w_ref[0]
                for k in range(1, ntap):
                    fir += (ff[:, (base + k) * L:(base + k + tsc) * L]
                            * w_ref[k])
            else:
                frames = ff.reshape(ti, ts + ntap - 1, L)
                fir = frames[:, base:base + tsc, :] * w_ref[0]
                for k in range(1, ntap):
                    fir += frames[:, base + k:base + k + tsc, :] * w_ref[k]
            return fir.reshape(ti * tsc, L)

        def quant(both):
            # ONE [R, L] x [L, 2*nchan] matmul produced re|im side by
            # side (the cos and -sin tables ride together; each output
            # column is an independent dot product, so the result is
            # bit-identical to two matmuls) — measured ~0.9 ms/window
            # faster than two [L, nchan] passes at production shape
            re = both[:, 0:nchan]
            im = both[:, nchan:]
            sc = scale_ref[0]
            r = jnp.clip(jnp.round(re * sc), -8, 7).astype(jnp.int32)
            q = jnp.clip(jnp.round(im * sc), -8, 7).astype(jnp.int32)
            packed = (((r & 0xF) << 4) | (q & 0xF)).astype(jnp.uint8)
            return packed.reshape(ti, tsc, nchan)

        if nchunk == 1:
            out_ref[:] = quant(dot(fir_chunk(0), cm_ref[:], dn2))
            return

        # Explicit software pipeline over row chunks (VERDICT r4 #2
        # A/B): issue chunk c+1's VPU FIR and chunk c-1's VPU
        # quantize/pack BETWEEN chunk c's MXU dots, giving Mosaic's
        # scheduler independent VPU work to overlap with the MXU
        # instead of one long serial FIR -> dot -> quantize chain.
        d_prev = dot(fir_chunk(0), cm_ref[:], dn2)
        for c in range(1, nchunk):
            f = fir_chunk(c)                      # VPU, indep of d_prev
            d = dot(f, cm_ref[:], dn2)            # MXU
            out_ref[:, (c - 1) * tsc:c * tsc, :] = quant(d_prev)  # VPU
            d_prev = d
        out_ref[:, (nchunk - 1) * tsc:, :] = quant(d_prev)

    return kernel


def _make_factored_kernel(ntap: int, L: int, nchan: int, ts: int,
                          ti: int, n_s: int, L1: int, L2: int,
                          fast: bool, paired: bool):
    """F-engine-scale variant: the direct [L, nchan] DFT matrices would
    need ~134 MB of VMEM at nchan=4096, so the kernel applies the
    two-stage Cooley-Tukey factorization (tables are a few hundred KB)
    — same derivation as :func:`..pfb._rdft_factored_tables`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    slab = (ts + ntap - 1) * L

    def kernel(xt_ref, w_ref, *rest):
        if paired:
            cs2_ref, twr_ref, twi_ref, cs1_ref = rest[:4]
            scale_ref, out_ref, xbuf, sems = rest[4:]
        else:
            c2_ref, s2_ref, twr_ref, twi_ref, c1_ref, s1_ref = rest[:6]
            scale_ref, out_ref, xbuf, sems = rest[6:]
        i = pl.program_id(0)
        s = pl.program_id(1)

        def get_dma(slot, s_idx):
            return pltpu.make_async_copy(
                xt_ref.at[pl.ds(i * ti, ti),
                          pl.ds(s_idx * ts * L, slab)],
                xbuf.at[slot], sems.at[slot])

        slot = s % 2

        @pl.when(s == 0)
        def _():
            get_dma(0, s).start()

        @pl.when(s + 1 < n_s)
        def _():
            get_dma((s + 1) % 2, s + 1).start()

        get_dma(slot, s).wait()
        ff = xbuf[slot].astype(jnp.float32)
        frames = ff.reshape(ti, ts + ntap - 1, L)
        fir = frames[:, 0:ts, :] * w_ref[0]
        for k in range(1, ntap):
            fir += frames[:, k:k + ts, :] * w_ref[k]
        R = ti * ts
        # x[n1 + L1*n2] -> [R, n2, n1]; inner DFT over n2
        x3 = fir.reshape(R * L2, L1)       # rows (R, n2), cols n1
        x3 = x3.reshape(R, L2, L1)
        dn_mid = (((1,), (0,)), ((), ()))
        dot = _make_dot(fast)

        # contract n2 -> [R, L1(n1), L2(k2)].  ``paired`` runs the
        # cos|(-sin) tables side by side in ONE matmul per stage
        # (independent output columns => bit-identical); unpaired keeps
        # the six narrower dots, whose smaller live intermediates
        # schedule better when VMEM is tight at F-engine scale.
        h = L1 // 2
        if paired:
            both2 = dot(x3, cs2_ref[:], dn_mid)
            sr = both2[..., 0:L2]
            si = both2[..., L2:]
        else:
            sr = dot(x3, c2_ref[:], dn_mid)
            si = dot(x3, s2_ref[:], dn_mid)
        # complex twiddle (sr + i si) * (twr + i twi), tables [L1, L2]
        tr = sr * twr_ref[:] - si * twi_ref[:]
        ti_ = sr * twi_ref[:] + si * twr_ref[:]
        # outer DFT over n1 (middle axis): [R, L1, L2] x [L1, L1h|L1h]
        if paired:
            tc = dot(tr, cs1_ref[:], dn_mid)
            td = dot(ti_, cs1_ref[:], dn_mid)
            xr = tc[..., 0:h] + td[..., h:]
            xi = td[..., 0:h] - tc[..., h:]
        else:
            c1, s1 = c1_ref[:], s1_ref[:]
            xr = dot(tr, c1, dn_mid) + dot(ti_, s1, dn_mid)
            xi = dot(ti_, c1, dn_mid) - dot(tr, s1, dn_mid)
        # [R, L2(k2), L1h(k1)]; k = k1*L2 + k2 — the k-axis reorder
        # happens OUTSIDE on the packed bytes (Mosaic cannot shape-cast
        # the transposed vector; XLA reorders the uint8 cheaply).
        # scale arrives pre-shaped [L2(k2), L1h(k1)].
        sc = scale_ref[:]
        r = jnp.clip(jnp.round(xr * sc), -8, 7).astype(jnp.int32)
        q = jnp.clip(jnp.round(xi * sc), -8, 7).astype(jnp.int32)
        packed = (((r & 0xF) << 4) | (q & 0xF)).astype(jnp.uint8)
        out_ref[:] = packed.reshape(ti, ts, L2, L1 // 2)

    return kernel


@functools.partial(jax.jit, static_argnames=("nchan", "ntap", "ti", "ts",
                                             "fast", "paired", "fir_impl",
                                             "pipeline_chunks",
                                             "interpret"))
def pfb_quantize_packed_pallas(x: jax.Array, window: jax.Array,
                               nchan: int, ntap: int, scale,
                               ti: int | None = None,
                               ts: int | None = None,
                               fast: bool = False,
                               paired: bool | None = None,
                               fir_impl: str = "frames",
                               pipeline_chunks: int = 1,
                               interpret: bool = False) -> jax.Array:
    """Fused PFB + 4-bit requant.

    Args:
      x: ADC samples [ntime, ninput], f32 or int8 (the production ADC
        is 8 bits — int8 input quarters the kernel's HBM read, the
        only traffic that matters at pipeline scale),
        ntime == (nspec + ntap - 1) * 2 * nchan.
      window: f32 [ntap, 2*nchan] prototype filter.
      scale: scalar or per-channel [nchan] requant gain.
      fast: single-pass bf16 DFT matmuls (~1e-2) instead of the
        3-pass HIGH split (~1e-6).
      pipeline_chunks: split each spectra tile into this many row
        chunks and emit an explicitly software-pipelined schedule
        (chunk c+1's VPU FIR and chunk c-1's VPU quantize/pack issued
        between chunk c's MXU dots).  Bit-identical to 1 (row-chunked
        FIR/DFT/quantize is the same arithmetic); must divide the
        spectra tile.  VERDICT r4 #2 overlap A/B knob.

    Returns:
      uint8 packed [ninput, nspec, nchan] (input-major; transpose the
      bytes for the correlator's [nspec, nchan, ninput]).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..pfb import _dft_factors, _rdft_factored_tables, rdft_matrices

    if x.dtype not in (jnp.float32, jnp.int8):
        raise ValueError(f"adc dtype must be float32 or int8, "
                         f"got {x.dtype}")
    L = 2 * nchan
    ntime, ninput = x.shape
    if ntime % L:
        raise ValueError("ntime must be a multiple of 2*nchan")
    nspec = ntime // L - (ntap - 1)
    factors = _dft_factors(L)
    # factored scale: the ~6 live [R, L1, L2] f32 intermediates plus
    # fir and the double-buffered slab must fit the 16 MB VMEM, so both
    # tile dims shrink (measured: ti=8/ts=8 at L=8192 overflows by 13 MB)
    ts_default, ti_default = _default_tiles(x.dtype, nspec, ninput,
                                            factors is not None)
    if ts is None:
        ts = ts_default
    if ti is None:
        ti = ti_default
    if ts is None or ninput % ti or nspec % ts:
        raise ValueError(f"no viable tiling for nspec={nspec}, "
                         f"ninput={ninput} (ts={ts}, ti={ti})")
    n_i, n_s = ninput // ti, nspec // ts

    xt = x.T  # [ninput, ntime]; one XLA transpose, folded where possible
    sc = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (nchan,))
    slab_shape = (ts + ntap - 1) * L

    if factors is not None:
        if pipeline_chunks != 1:
            raise ValueError("pipeline_chunks applies to the direct "
                             "kernel only (the factored tile is already "
                             "ts<=8)")
        L1, L2 = factors
        tables, _ = _rdft_factored_tables(nchan)
        c2, s2, twr, twi, c1, s1 = tables
        if paired is None:
            paired = False  # measured faster unpaired at F-engine scale
        if paired:
            table_arrays = (
                jnp.asarray(np.concatenate([c2, s2], axis=1)),
                jnp.asarray(twr), jnp.asarray(twi),
                jnp.asarray(np.concatenate([c1, s1], axis=1)))
        else:
            table_arrays = tuple(
                jnp.asarray(m) for m in (c2, s2, twr, twi, c1, s1))
        kernel = _make_factored_kernel(ntap, L, nchan, ts, ti, n_s,
                                       L1, L2, fast, paired)
        table_spec = [
            pl.BlockSpec(m.shape, lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM)
            for m in table_arrays]
        # the kernel's scale table is indexed [k2, k1]
        sc_kernel = sc.reshape(L1 // 2, L2).T
        out4 = pl.pallas_call(
            kernel,
            grid=(n_i, n_s),
            in_specs=[
                pl.BlockSpec((ninput, ntime), lambda i, s: (0, 0),
                             memory_space=pl.ANY),
                pl.BlockSpec((ntap, L), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),
                *table_spec,
                pl.BlockSpec((L2, L1 // 2), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ti, ts, L2, L1 // 2),
                                   lambda i, s: (i, s, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (ninput, nspec, L2, L1 // 2), jnp.uint8),
            scratch_shapes=[
                pltpu.VMEM((2, ti, slab_shape), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
            # the ~6 live [R, L1, L2] f32 intermediates need more than
            # the default 16 MB scoped-vmem budget at L=8192
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * ninput * nspec * L * (ntap + L1 + 2 * L2),
                bytes_accessed=(x.dtype.itemsize * ninput * ntime
                                + ninput * nspec * nchan),
                transcendentals=0),
        )(xt, window, *table_arrays, sc_kernel)
        # k = k1*L2 + k2: reorder the packed bytes
        return jnp.swapaxes(out4, 2, 3).reshape(ninput, nspec, nchan)

    cos_m, msin_m = rdft_matrices(nchan)
    cm = jnp.asarray(np.concatenate([cos_m, msin_m], axis=1))
    if fir_impl == "flat" and L % 128:
        fir_impl = "frames"  # flat tap views need lane-tile alignment
    if ts % pipeline_chunks:
        raise ValueError(f"pipeline_chunks={pipeline_chunks} must "
                         f"divide the spectra tile ts={ts}")
    kernel = _make_kernel(ntap, L, nchan, ts, ti, n_s, fast,
                          fir_impl=fir_impl, nchunk=pipeline_chunks)
    # flat FIR consumes the window pre-tiled to the FIR chunk width so
    # the tap views multiply against lane-aligned flat slabs
    tsc = ts // pipeline_chunks
    w_arg = (jnp.tile(window, (1, tsc)) if fir_impl == "flat"
             else window)
    w_width = tsc * L if fir_impl == "flat" else L
    slab = (ts + ntap - 1) * L
    out = pl.pallas_call(
        kernel,
        grid=(n_i, n_s),
        in_specs=[
            pl.BlockSpec((ninput, ntime), lambda i, s: (0, 0),
                         memory_space=pl.ANY),      # whole stream, HBM
            pl.BlockSpec((ntap, w_width), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 2 * nchan), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nchan), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ti, ts, nchan), lambda i, s: (i, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ninput, nspec, nchan),
                                       jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((2, ti, slab), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        # int8 input at ti=32 carries ~2.6 MB of live f32 FIR + DFT
        # intermediates on top of the slab — above the 16 MB default
        # only at wide ts, but the explicit cap is cheap insurance
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * ninput * nspec * L * (ntap + 2 * nchan),
            bytes_accessed=(x.dtype.itemsize * ninput * ntime
                            + ninput * nspec * nchan),
            transcendentals=0),
    )(xt, w_arg, cm, sc.reshape(1, nchan))
    return out
