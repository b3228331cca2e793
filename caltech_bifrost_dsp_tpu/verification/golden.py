"""Golden-vector generation, file IO and checking.

Byte-compatible re-implementation of the reference's verification machinery
(reference: pipeline/verification/make_golden_inputs.py and
pipeline/verification/README.md): input files are a one-line JSON header
followed by raw uint8 4+4-bit samples in [ntime, nchan, nstand, npol] order;
correlation files hold complex128 ``[ntime//acc, nchan, nstand, nstand,
npol, npol]`` with the convention
``corr[..., s0, s1, p0, p1] = v(s0, p0) * conj(v(s1, p1))`` accumulated over
``acc_len`` spectra.

Random inputs replicate the reference's exact RNG stream (numpy legacy
``np.random.seed(seed)`` then per-block ``randint(0, 255, ...)`` — note the
exclusive high bound, so byte value 255 never occurs:
make_golden_inputs.py:57,137).
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..utils.codec import unpack_complex_np

DEFAULT_SEED = 0xdeadbeef  # reference: make_golden_inputs.py:20


def generate_input_blocks(ntime, nchan, nstand, npol, acc_len,
                          seed=DEFAULT_SEED, chanramp=False):
    """Yield uint8 [acc_len, nchan, nstand, npol] blocks, RNG-stream-exact
    with the reference generator."""
    assert ntime % acc_len == 0
    nblock = ntime // acc_len
    if chanramp:
        d = np.zeros([nchan, nstand, npol], dtype=np.uint8)
        ramp = (np.arange(nchan, dtype=np.uint32) & 0xFF).astype(np.uint8)
        d[...] = ramp[:, None, None]
        block = np.broadcast_to(d, (acc_len, nchan, nstand, npol))
        for _ in range(nblock):
            yield block
    else:
        rng = np.random.RandomState(seed)
        for _ in range(nblock):
            yield rng.randint(0, 255, [acc_len, nchan, nstand, npol],
                              dtype=np.uint8)


def reference_correlation(block_u8: np.ndarray) -> np.ndarray:
    """Exact numpy correlation of one block, accumulated over its time axis.

    Input uint8 [ntime, nchan, nstand, npol]; output complex128
    [nchan, nstand, nstand, npol, npol] with the golden convention
    (reference: make_golden_inputs.py:124-126, 156-158).
    """
    ntime, nchan, nstand, npol = block_u8.shape
    dc = unpack_complex_np(block_u8).astype(np.complex128)
    x = dc.reshape(ntime, nchan, nstand * npol)
    # V[c, i, j] = sum_t x[t,c,i] * conj(x[t,c,j])
    v = np.einsum("tci,tcj->cij", x, np.conj(x))
    return v.reshape(nchan, nstand, npol, nstand, npol).transpose(0, 1, 3, 2, 4)


def write_input_file(path, ntime, nchan, nstand, npol, acc_len,
                     seed=DEFAULT_SEED, chanramp=False, timestamp=0.0):
    """Write an ``in_*.dat`` golden input file (format:
    reference: make_golden_inputs.py:94-109)."""
    meta = {"time": timestamp, "ntime": ntime, "nstand": nstand,
            "npol": npol, "nchan": nchan, "seed": seed,
            "shape": [ntime, nchan, nstand, npol], "dtype": "np.uint8",
            "type": "chanramp" if chanramp else "random"}
    with open(path, "wb") as fh:
        fh.write(json.dumps(meta).encode())
        fh.write(b"\n")
        for block in generate_input_blocks(ntime, nchan, nstand, npol,
                                           acc_len, seed, chanramp):
            fh.write(np.ascontiguousarray(block).tobytes())
    return meta


def write_corr_file(path, ntime, nchan, nstand, npol, acc_len,
                    seed=DEFAULT_SEED, chanramp=False, timestamp=0.0):
    """Write a ``corr_*.dat`` golden correlation file (format:
    reference: make_golden_inputs.py:76-92)."""
    meta = {"time": timestamp, "acc_len": acc_len, "ntime": ntime // acc_len,
            "nstand": nstand, "npol": npol, "nchan": nchan, "seed": seed,
            "shape": [ntime // acc_len, nchan, nstand, nstand, npol, npol],
            "dtype": "np.complex",
            "type": "chanramp" if chanramp else "random"}
    with open(path, "wb") as fh:
        fh.write(json.dumps(meta).encode())
        fh.write(b"\n")
        for block in generate_input_blocks(ntime, nchan, nstand, npol,
                                           acc_len, seed, chanramp):
            fh.write(reference_correlation(block).tobytes())
    return meta


def read_dat(path):
    """Read a golden ``.dat`` file -> (meta dict, ndarray).

    Handles both dtypes the reference writes ("np.uint8", "np.complex").
    """
    with open(path, "rb") as fh:
        header = fh.readline()
        meta = json.loads(header.decode())
        dtype = {"np.uint8": np.uint8, "np.complex": np.complex128,
                 "complex128": np.complex128}[meta["dtype"]]
        data = np.frombuffer(fh.read(), dtype=dtype)
    return meta, data.reshape(meta["shape"])


def input_filename(datapath, ntime, nchan, nstand, npol,
                   seed=DEFAULT_SEED, chanramp=False):
    """Reference naming scheme (make_golden_inputs.py:64-69)."""
    if chanramp:
        return os.path.join(datapath, "in_%dt_%dc_%ds_%dp_chanramp.dat"
                            % (ntime, nchan, nstand, npol))
    return os.path.join(datapath, "in_%dt_%dc_%ds_%dp_%x.dat"
                        % (ntime, nchan, nstand, npol, seed))


def corr_filename(datapath, ntime, accshort, nchan, nstand, npol,
                  seed=DEFAULT_SEED, chanramp=False):
    if chanramp:
        return os.path.join(datapath, "corr_%dt_%da_%dc_%ds_%dp_chanramp.dat"
                            % (ntime, accshort, nchan, nstand, npol))
    return os.path.join(datapath, "corr_%dt_%da_%dc_%ds_%dp_%x.dat"
                        % (ntime, accshort, nchan, nstand, npol, seed))


def check_vis_against_golden(vis_dense: np.ndarray, golden: np.ndarray
                             ) -> bool:
    """Exact-equality gate, the analog of the reference's int-equality
    baseline-by-baseline check (reference:
    corr_output_full_block.py:550-603 via CorrOutputFull.check_against_file).

    Args:
      vis_dense: complex [nchan, ninput, ninput] from the TPU correlator.
      golden: complex [nchan, nstand, nstand, npol, npol] golden block.
    """
    nchan, nstand, _, npol, _ = golden.shape
    g = golden.transpose(0, 1, 3, 2, 4).reshape(nchan, nstand * npol,
                                                nstand * npol)
    return bool(np.array_equal(vis_dense, g))
