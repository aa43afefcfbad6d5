"""Native C++ data-op tests: build, and numerical parity vs the pure-numpy
fallbacks (run with TPUKALDI_NATIVE=0 semantics forced via direct calls)."""

import numpy as np
import pytest

from tpukaldi import native
from tpukaldi.io import feats as F


pytestmark = pytest.mark.skipif(
    native.lib() is None, reason="native lib unavailable (g++ build failed)"
)


def _numpy_splice(fea, left, right):
    n, d = fea.shape
    out = np.empty((n, d * (left + right + 1)), dtype=fea.dtype)
    for idx, lag in enumerate(range(-left, right + 1)):
        out[:, idx * d : (idx + 1) * d] = np.roll(fea, -lag, axis=0)
    return out[left : n - right]


def test_native_splice_parity():
    rng = np.random.default_rng(0)
    fea = rng.standard_normal((50, 13)).astype(np.float32)
    for left, right in [(1, 1), (5, 5), (3, 0), (0, 4)]:
        got = native.splice(fea, left, right)
        want = _numpy_splice(fea, left, right)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_native_chunk_cmvn_parity():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((400, 13)) * 3 + 5).astype(np.float32)
    want = (x - x.mean(axis=0, dtype=np.float64)) / x.std(
        axis=0, dtype=np.float64
    )
    got = native.chunk_cmvn(x.copy())
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_native_apply_cmvn_parity():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((100, 8)).astype(np.float32) * 2 + 1
    stats = F.compute_cmvn_stats(x)
    for nv in (False, True):
        got = native.apply_cmvn(x.copy(), stats, nv)
        dim = 8
        count = stats[0, dim]
        mean = stats[0, :dim] / count
        want = x - mean
        if nv:
            var = stats[1, :dim] / count - mean**2
            want = want / np.sqrt(np.maximum(var, 1e-20))
        np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-4,
                                   atol=1e-5)


def test_native_add_deltas_parity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((60, 5)).astype(np.float32)
    scales = F._delta_scales(2, 2)
    got = native.add_deltas(x, scales, 2)
    # numpy reference
    n = x.shape[0]
    blocks = []
    for coeffs in scales:
        offset = (len(coeffs) - 1) // 2
        acc = np.zeros_like(x, dtype=np.float64)
        for j, c in enumerate(coeffs):
            if c == 0.0:
                continue
            idx = np.clip(np.arange(n) + (j - offset), 0, n - 1)
            acc += c * x[idx]
        blocks.append(acc)
    want = np.concatenate(blocks, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_native_cm1_parity():
    import io as _io
    import struct

    from tpukaldi.io import kaldi_io as kio

    rows, cols = 7, 3
    min_v, rng_v = -1.0, 2.0
    rng = np.random.default_rng(4)
    headers = np.sort(
        rng.integers(0, 65535, (cols, 4)).astype("<u2"), axis=1
    )
    data = rng.integers(0, 256, (cols, rows)).astype(np.uint8)
    got = native.decode_cm1(headers, data, min_v, rng_v, rows, cols)
    # python reference via the codec with native disabled
    buf = b"k \x00B" + b"CM " + struct.pack("<ff", min_v, rng_v)
    buf += struct.pack("<ii", rows, cols) + headers.tobytes() + data.tobytes()
    import os

    os.environ["TPUKALDI_NATIVE"] = "0"
    try:
        want = dict(kio.read_mat_ark(_io.BytesIO(buf)))["k"]
    finally:
        os.environ["TPUKALDI_NATIVE"] = "1"
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_feats_wrappers_use_native():
    rng = np.random.default_rng(5)
    fea = rng.standard_normal((30, 4)).astype(np.float32)
    out = F.splice(fea, 2, 2)
    assert out.shape == (26, 20)
    out2 = F.chunk_cmvn(fea.copy())
    np.testing.assert_allclose(out2.mean(axis=0), 0.0, atol=1e-5)
