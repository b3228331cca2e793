"""On-chip Mosaic golden-parity gate (VERDICT r4 #1).

Runs the COMMITTED production engines (``config.TPU_ENGINES``, cti
staging layout — byte-for-byte the program ``bench.py`` measures) on the
REAL TPU against golden vectors at the reference's production geometry:
ntime=7200, nstand=352, npol=2, acc_len=2400, at BOTH shipped channel
counts (192 and 184), and requires EXACT integer equality on

  * every element of every fast-accumulation dump (3 per geometry),
  * the final slow accumulator (sum of all three windows),
  * every element of every subselection output (4704 baselines,
    4-chan sums), and
  * the VLBI beam-0 voltage downselect (exact: with integer gains every
    bf16 product and f32 partial sum is exactly representable),

plus a toleranced power-beam check (rtol 1e-4 vs a float64 host
reference — the power stage rounds |v|^2 in f32, so exactness is not
the spec there).

An FX leg (:func:`run_fx`, skip with ``--no-fx``) additionally proves
the fused Pallas channelizer on real Mosaic at the production kernel
geometry: int8 ADC input bit-identical to f32, the software-pipelined
``pipeline_chunks`` schedule bit-identical to straight-line, and the
high/bf16 packed products against a float64-input host PFB
(>=99.9%/>=99.5% byte-identical, off-by-<=1-LSB elsewhere —
test_pfb_precision.py conventions).

Golden side: the reference's shipped test-vector tarballs
(reference: pipeline/verification/test_vectors/
in_7200t_{192,184}c_352s_2p_deadbeef.dat.tar.gz) are deterministic
outputs of its generator (reference:
pipeline/verification/make_golden_inputs.py, seed 0xdeadbeef), and this
repo's :mod:`..verification.golden` is proven byte-identical to that
script run verbatim (tests/test_golden_crossrun.py, test_golden_184.py)
— so the vectors are regenerated here with the same RNG stream rather
than decoded from the tarballs (which are git-lfs pointer stubs in this
checkout).  The host-side expected correlation uses exact float32 GEMMs
(every partial sum is an integer < 2^24) and is itself verified against
:func:`..verification.golden.reference_correlation` on the first
channels of the first window.

Why this gate exists: every other exact-equality test in the suite runs
the Pallas kernels in INTERPRET mode on CPU; a Mosaic miscompile or
layout bug at the production shape would pass all of them and still
produce wrong science.  The reference runs its golden check on the
production device as a first-class block mode (reference:
pipeline/lwa352_pipeline/blocks/corr_output_full_block.py:550-603) and
its kernel test on the real GPU (reference:
pipeline/verification/xgpu_test.py:88-136); this is the TPU analog.

Writes a machine-readable artifact (default ``TPUPARITY_r05.json``)
recording pass/fail per dump per geometry.  Exit code 0 == all exact
gates passed.

Run: ``python -m caltech_bifrost_dsp_tpu.scripts.tpu_parity`` on a host
with the TPU visible (do NOT force JAX_PLATFORMS=cpu).  The env-gated
suite hook is ``CBD_TPU_PARITY=1 pytest tests/test_tpu_parity.py``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def host_corr_int32(block_u8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact host correlation of one window via float32 GEMMs.

    Input uint8 [ntime, nchan, nstand, npol]; returns (re, im) int32
    [nchan, ninput, ninput] with the golden convention
    ``V[c,a,b] = sum_t x[t,c,a] * conj(x[t,c,b])``.

    Exact because every partial sum is an integer bounded by
    ntime * 128 (= 307200 at acc_len 2400) < 2^24, so float32
    accumulation never rounds.  ~50x faster than the complex128 einsum
    in :func:`..verification.golden.reference_correlation` at the
    production shape; equality of the two is asserted by the caller on
    a sample.
    """
    from ..utils.codec import unpack_np

    ntime, nchan, nstand, npol = block_u8.shape
    ni = nstand * npol
    re8, im8 = unpack_np(block_u8.reshape(ntime, nchan, ni))
    vr = np.empty((nchan, ni, ni), np.int32)
    vi = np.empty((nchan, ni, ni), np.int32)
    for c in range(nchan):
        r = re8[:, c, :].astype(np.float32)   # [t, ni]
        i = im8[:, c, :].astype(np.float32)
        a = np.concatenate([r, i], axis=0)     # [2t, ni]
        vr[c] = (a.T @ a).astype(np.int32)     # r^T r + i^T i
        ir = i.T @ r                           # [ni, ni]
        vi[c] = (ir - ir.T).astype(np.int32)   # i^T r - r^T i
    return vr, vi


def host_beams(block_u8: np.ndarray, gr: np.ndarray, gi: np.ndarray
               ) -> tuple[np.ndarray, np.ndarray]:
    """Float64 beam voltages [nchan, nbeam, ntime] (the truth reference
    for the power/VLBI products; conventions from ops/beamform.py)."""
    from ..utils.codec import unpack_np

    ntime, nchan, nstand, npol = block_u8.shape
    ni = nstand * npol
    re8, im8 = unpack_np(block_u8.reshape(ntime, nchan, ni))
    xr = re8.transpose(1, 0, 2).astype(np.float64)  # [c, t, ni]
    xi = im8.transpose(1, 0, 2).astype(np.float64)
    grt = gr.astype(np.float64).transpose(0, 2, 1)  # [c, ni, b]
    git = gi.astype(np.float64).transpose(0, 2, 1)
    br = xr @ grt - xi @ git                        # [c, t, b]
    bi = xi @ grt + xr @ git
    return br.transpose(0, 2, 1), bi.transpose(0, 2, 1)


def host_power(br, bi, ntime_sum: int) -> np.ndarray:
    """[nbeam//2, ntime//ntime_sum, nchan, 4] XX/YY/ReXY/ImXY (float64),
    mirroring ops/beamform.beam_power_sum."""
    nchan, nbeam, ntime = br.shape
    nblock = ntime // ntime_sum

    def split(z):
        z = z.reshape(nchan, nbeam // 2, 2, nblock, ntime_sum)
        return z[:, :, 0], z[:, :, 1]

    xr, yr = split(br)
    xi, yi = split(bi)
    out = np.stack([
        (xr * xr + xi * xi).sum(-1),
        (yr * yr + yi * yi).sum(-1),
        (xr * yr + xi * yi).sum(-1),
        (xi * yr - xr * yi).sum(-1)], axis=-1)
    return out.transpose(1, 2, 0, 3)


def host_subsel(vr, vi, pairs, nchan_sum: int
                ) -> tuple[np.ndarray, np.ndarray]:
    """Exact subselection expected values from the host dense matrix:
    gather [c, i0, i1] then sum channel groups (int64 on host; values
    fit int32 by construction)."""
    nchan = vr.shape[0]
    i0, i1 = pairs[:, 0], pairs[:, 1]
    sr = vr[:, i0, i1].astype(np.int64)
    si = vi[:, i0, i1].astype(np.int64)
    sr = sr.reshape(nchan // nchan_sum, nchan_sum, -1).sum(1)
    si = si.reshape(nchan // nchan_sum, nchan_sum, -1).sum(1)
    return sr.astype(np.int32), si.astype(np.int32)


def _eq(a, b) -> dict:
    a = np.asarray(a)
    b = np.asarray(b)
    exact = bool(np.array_equal(a, b))
    out = {"exact": exact}
    if not exact:
        d = np.abs(a.astype(np.int64) - b.astype(np.int64))
        out["mismatches"] = int((d > 0).sum())
        out["max_abs_diff"] = int(d.max())
    return out


def run_geometry(nchan: int, ntime: int, nstand: int, art: dict,
                 tiny: bool = False) -> bool:
    import jax
    import jax.numpy as jnp

    from ..config import LWA352_TPU
    from ..models import xengine
    from ..ops import corr_subsel as cs
    from ..ops.pallas.beamform_fused import stacked_gains
    from ..verification import golden

    t_start = time.time()
    if tiny:
        cfg = LWA352_TPU.replace(nstand=nstand, nchan=nchan,
                                 ntime_gulp=48, acc_len=96,
                                 acc_len_slow=96 * 3, nbeam=4,
                                 ntime_sum=12, nchan_sum=4)
    else:
        cfg = LWA352_TPU.replace(nchan=nchan, nstand=nstand)
    acc = cfg.acc_len
    assert ntime % acc == 0
    nwin = ntime // acc
    ni = cfg.ninput
    ni_pad = xengine.bf_operand_ni(cfg)

    # integer gains: exactly representable in bf16, so the fused
    # beamformer's products and f32 partial sums are exact and the VLBI
    # voltage check can demand bit-equality
    grng = np.random.RandomState(0xBF)
    gr = grng.randint(-8, 9, [cfg.nchan, cfg.nbeam, ni]).astype(np.float32)
    gi = grng.randint(-8, 9, [cfg.nchan, cfg.nbeam, ni]).astype(np.float32)
    from ..ops.beamform import BeamGains
    gains = BeamGains(jnp.asarray(gr), jnp.asarray(gi))
    gstack = stacked_gains(gains, ni_pad)

    pairs_np = cs.baselines_to_inputs(
        cs.production_baselines(cfg.nvis_out, cfg.nstand, cfg.npol),
        cfg.npol).astype(np.int32)
    pairs = jnp.asarray(pairs_np)

    state = xengine.init_state(cfg)

    @jax.jit
    def step_first(state, packed, gains, pairs):
        return xengine.xengine_step(state, packed, gains, pairs,
                                    True, True, True, cfg, layout="cti")

    @jax.jit
    def step_next(state, packed, gains, pairs):
        return xengine.xengine_step(state, packed, gains, pairs,
                                    True, True, False, cfg, layout="cti")

    @jax.jit
    def dump_fast(st):
        v = xengine.dense_vis(st.vis_fast, cfg)
        return v.real, v.imag

    @jax.jit
    def dump_slow(st):
        v = xengine.dense_vis(st.vis_slow, cfg)
        return v.real, v.imag

    geom = {"nchan": nchan, "ntime": ntime, "nstand": nstand,
            "acc_len": acc, "windows": []}
    art["geometries"]["%dc" % nchan] = geom
    ok = True
    slow_re = None
    slow_im = None

    blocks = golden.generate_input_blocks(ntime, nchan, cfg.nstand,
                                          cfg.npol, acc)
    for w, block in enumerate(blocks):
        # cti staging: chan-major, time, 256-padded input axis (pad
        # lanes zero here; the kernels treat them as don't-care)
        flat = block.reshape(acc, nchan, ni)
        staged = np.zeros((nchan, acc, ni_pad), np.uint8)
        staged[:, :, :ni] = flat.transpose(1, 0, 2)
        packed = jnp.asarray(staged)

        step = step_first if w == 0 else step_next
        state, outs = step(state, packed, gains if cfg.bf_engine != "pallas"
                           else gstack, pairs)

        # host expected (exact)
        hvr, hvi = host_corr_int32(block)
        if w == 0:
            # anchor the fast host path to the proven golden generator
            # on a sample of channels
            ncheck = min(2, nchan)
            gold = golden.reference_correlation(block[:, :ncheck])
            gold = gold.transpose(0, 1, 3, 2, 4).reshape(ncheck, ni, ni)
            assert np.array_equal(hvr[:ncheck], gold.real.astype(np.int64)
                                  .astype(np.int32)), \
                "host GEMM corr disagrees with golden.reference_correlation"
            assert np.array_equal(hvi[:ncheck], gold.imag.astype(np.int64)
                                  .astype(np.int32))
        if slow_re is None:
            slow_re, slow_im = hvr.copy(), hvi.copy()
        else:
            slow_re += hvr
            slow_im += hvi

        win = {"window": w}
        # fast dump: exact equality, every element
        dre, dim = jax.device_get(dump_fast(state))
        win["fast_re"] = _eq(dre, hvr)
        win["fast_im"] = _eq(dim, hvi)

        # subselection: exact equality
        ssr, ssi = host_subsel(hvr, hvi, pairs_np, cfg.nchan_sum)
        win["subsel_re"] = _eq(np.asarray(outs.subsel.real), ssr)
        win["subsel_im"] = _eq(np.asarray(outs.subsel.imag), ssi)

        # beam products: VLBI voltages exact (integer gains), power
        # toleranced (f32 rounding in |v|^2 accumulation is the spec)
        br, bi = host_beams(block, gr, gi)
        vlbi = np.asarray(outs.vlbi)                   # [t, c, 2, 2]
        hv = np.stack([br[:, :2], bi[:, :2]], axis=-1)  # [c, 2, t, 2]
        hv = hv.transpose(2, 0, 1, 3)
        win["vlbi"] = {"exact": bool(np.array_equal(
            vlbi, hv.astype(np.float32)))}
        hp = host_power(br, bi, cfg.ntime_sum)
        power = np.asarray(outs.bf_power, dtype=np.float64)
        atol = 1e-4 * float(np.abs(hp).max())
        win["power"] = {
            "allclose_rtol1e-4": bool(np.allclose(power, hp, rtol=1e-4,
                                                  atol=atol)),
            "max_rel_err": float(np.max(np.abs(power - hp)
                                        / (np.abs(hp) + atol)))}
        geom["windows"].append(win)
        exact_ok = all(win[k].get("exact", False) for k in
                       ("fast_re", "fast_im", "subsel_re", "subsel_im",
                        "vlbi"))
        ok = ok and exact_ok and win["power"]["allclose_rtol1e-4"]
        print(f"[{nchan}c] window {w}: "
              + ("EXACT" if exact_ok else f"MISMATCH {win}")
              + f" (power rel err {win['power']['max_rel_err']:.2e})",
              flush=True)

    # slow accumulator after all windows: exact equality
    sre, sim = jax.device_get(dump_slow(state))
    geom["slow_re"] = _eq(sre, slow_re)
    geom["slow_im"] = _eq(sim, slow_im)
    slow_ok = geom["slow_re"]["exact"] and geom["slow_im"]["exact"]
    ok = ok and slow_ok
    geom["seconds"] = round(time.time() - t_start, 1)
    geom["pass"] = ok
    print(f"[{nchan}c] slow accumulator: "
          + ("EXACT" if slow_ok else "MISMATCH")
          + f" — geometry {'PASS' if ok else 'FAIL'} "
          f"({geom['seconds']} s)", flush=True)
    return ok


def run_fx(art: dict, nspec: int = 600, nchan: int = 192,
           ninput: int = 704, ntap: int = 4, tiny: bool = False) -> bool:
    """FX-leg on-chip parity: the fused Pallas channelizer at the
    production kernel geometry (192 chan, 704 inputs, ts=120/ti=32
    int8 tiling — the tiles bench_fx measures) against a float64-input
    host PFB, plus the two bit-identity claims the CPU suite can only
    prove in interpret mode:

      * int8 ADC input produces BIT-IDENTICAL packed bytes to the same
        values fed as f32 (the ``adc_dtype="int8"`` production claim),
        on real Mosaic;
      * the ``pipeline_chunks`` software-pipelined schedule is
        BIT-IDENTICAL to the straight-line kernel, on real Mosaic;

    and the precision-class gates vs the host reference
    (test_pfb_precision.py conventions): "high" packed bytes >=99.9%
    identical / off-by-<=1-LSB elsewhere, "bf16" >=99.5% / <=1 LSB.
    """
    import jax
    import jax.numpy as jnp

    from ..ops import pfb as pfb_ops
    from ..ops.pallas.pfb_fused import pfb_quantize_packed_pallas

    t0 = time.time()
    if tiny:
        nspec, nchan, ninput = 48, 32, 16
    L = 2 * nchan
    interp = tiny and jax.default_backend() == "cpu"
    rng = np.random.RandomState(0xF0)
    t = np.arange((nspec + ntap - 1) * L)
    scene = (10.0 * rng.standard_normal([t.size, ninput])
             + 60.0 * np.cos(2 * np.pi * (min(100, nchan - 2) / L)
                             * t[:, None])).astype(np.float32)
    adc_i8 = np.clip(np.rint(scene), -127, 127).astype(np.int8)
    adc_f32 = adc_i8.astype(np.float32)
    w = pfb_ops.pfb_window(nchan, ntap)

    # float64-input host reference -> shared quantization rule
    ref = pfb_ops.pfb_reference_np(adc_f32.astype(np.float64),
                                   np.asarray(w, np.float64), nchan, ntap)
    ref = np.moveaxis(ref, 2, 0)            # [ninput, nspec, nchan]
    scale = float(7.0 / np.abs(ref).max())

    def host_pack(z):
        r = np.clip(np.round(z.real * scale), -8, 7).astype(np.int32)
        i = np.clip(np.round(z.imag * scale), -8, 7).astype(np.int32)
        return (((r & 0xF) << 4) | (i & 0xF)).astype(np.uint8)

    ref_pk = host_pack(ref)

    def chip(x, fast, chunks=1):
        out = pfb_quantize_packed_pallas(
            jnp.asarray(x), jnp.asarray(w), nchan, ntap, scale,
            fast=fast, pipeline_chunks=chunks, interpret=interp)
        return np.asarray(jax.device_get(out))

    def nibble_cmp(a, b):
        def unpack(z):
            z = z.astype(np.int32)
            return ((((z >> 4) & 0xF) ^ 8) - 8, ((z & 0xF) ^ 8) - 8)

        ar, ai = unpack(a)
        br, bi = unpack(b)
        same = float(np.mean(a == b))
        max_lsb = int(max(np.abs(ar - br).max(), np.abs(ai - bi).max()))
        return same, max_lsb

    rec = {"nspec": nspec, "nchan": nchan, "ninput": ninput}
    hi_i8 = chip(adc_i8, fast=False)
    hi_f32 = chip(adc_f32, fast=False)
    rec["int8_eq_f32"] = bool(np.array_equal(hi_i8, hi_f32))
    # pipeline_chunks must divide the kernel's auto-chosen spectra
    # TILE, not nspec — derive it from the same tiling policy
    from ..ops.pallas.pfb_fused import _default_tiles

    ts_auto, _ = _default_tiles(jnp.int8, nspec, ninput, False)
    nck = next((c for c in (3, 2) if ts_auto and ts_auto % c == 0), 1)
    ck = chip(adc_i8, fast=False, chunks=nck)
    rec["chunks"] = nck
    rec["chunks_eq"] = bool(np.array_equal(hi_i8, ck))
    same_hi, lsb_hi = nibble_cmp(hi_i8, ref_pk)
    rec["high_vs_host"] = {"frac_identical": round(same_hi, 6),
                           "max_lsb_diff": lsb_hi}
    bf = chip(adc_i8, fast=True)
    same_bf, lsb_bf = nibble_cmp(bf, ref_pk)
    rec["bf16_vs_host"] = {"frac_identical": round(same_bf, 6),
                           "max_lsb_diff": lsb_bf}
    ok = (rec["int8_eq_f32"] and rec["chunks_eq"]
          and same_hi >= 0.999 and lsb_hi <= 1
          and same_bf >= 0.995 and lsb_bf <= 1)
    rec["seconds"] = round(time.time() - t0, 1)
    rec["pass"] = ok
    art["fx"] = rec
    print(f"[fx] int8==f32: {rec['int8_eq_f32']}  chunks==1: "
          f"{rec['chunks_eq']}  high vs host: {same_hi:.4%}/"
          f"<= {lsb_hi} LSB  bf16 vs host: {same_bf:.4%}/<= {lsb_bf} "
          f"LSB — {'PASS' if ok else 'FAIL'} ({rec['seconds']} s)",
          flush=True)
    return ok


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="on-chip golden-parity gate at production geometry")
    p.add_argument("--out", default=None,
                   help="artifact path (default TPUPARITY_r05.json for "
                        "a real on-chip run; a throwaway /tmp path for "
                        "--tiny / CPU self-tests so they cannot "
                        "overwrite the committed on-chip evidence)")
    p.add_argument("--nchan", type=int, nargs="+", default=[192, 184],
                   help="channel geometries (the reference ships 192c "
                        "and 184c vectors)")
    p.add_argument("--ntime", type=int, default=7200,
                   help="samples (the shipped tarballs hold 7200)")
    p.add_argument("--nstand", type=int, default=352)
    p.add_argument("--no-fx", action="store_true",
                   help="skip the FX channelizer leg")
    p.add_argument("--only-fx", action="store_true",
                   help="run only the FX channelizer leg")
    p.add_argument("--tiny", action="store_true",
                   help="small self-test config (CPU interpret mode OK)")
    args = p.parse_args(argv)

    import jax

    try:  # persistent compile cache: tunnel compiles take minutes
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass

    backend = jax.default_backend()
    dev = str(jax.devices()[0])
    if args.out is None:
        args.out = ("TPUPARITY_r05.json"
                    if backend != "cpu" and not args.tiny
                    else "/tmp/tpuparity_selftest.json")
    if backend == "cpu" and not args.tiny:
        print("ERROR: this gate must run on the real TPU (backend is "
              "'cpu'; Pallas would run in interpret mode and prove "
              "nothing about Mosaic). Use --tiny for a logic self-test.",
              file=sys.stderr)
        return 2

    art = {"backend": backend, "device": dev,
           "engines": "config.TPU_ENGINES (pallas_blk + pallas bf + "
                      "bands subsel), cti layout",
           "seed": "0xdeadbeef (reference make_golden_inputs.py:20)",
           "geometries": {}}
    # partial runs (--only-fx / --no-fx) merge into an existing
    # artifact so the file always carries every section's latest result
    import os

    if os.path.exists(args.out) and (args.only_fx or args.no_fx):
        try:
            with open(args.out) as fh:
                prev = json.load(fh)
            if prev.get("backend") == backend:
                art["geometries"] = prev.get("geometries", {})
                if "fx" in prev:
                    art["fx"] = prev["fx"]
        except (OSError, ValueError):
            pass
    ok = True
    if not args.only_fx:
        for nchan in args.nchan:
            ok = run_geometry(nchan, args.ntime, args.nstand, art,
                              tiny=args.tiny) and ok
    if not args.no_fx:
        ok = run_fx(art, tiny=args.tiny) and ok
    sections = list(art["geometries"].values())
    if "fx" in art:
        sections.append(art["fx"])
    # the artifact's verdict ANDs in merged sections from earlier
    # partial runs; the exit code and banner must agree with it, not
    # just with the legs this invocation ran
    art["pass"] = ok and all(s.get("pass", False) for s in sections)
    art["time_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(args.out, "w") as fh:
        json.dump(art, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(("PASS" if art["pass"] else "FAIL") + f" -> {args.out}",
          flush=True)
    return 0 if art["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
