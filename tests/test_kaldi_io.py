"""Codec tests: byte-golden fixtures hand-assembled from the Kaldi wire-format
spec, plus write->read round trips (SURVEY.md §4 test plan)."""

import io
import struct

import numpy as np
import pytest

from tpukaldi.io import kaldi_io as kio


def _golden_fm(key, mat):
    """Assemble a binary float-matrix ark entry byte by byte."""
    buf = key.encode() + b" " + b"\x00B" + b"FM "
    buf += b"\x04" + struct.pack("<i", mat.shape[0])
    buf += b"\x04" + struct.pack("<i", mat.shape[1])
    buf += mat.astype("<f4").tobytes()
    return buf


def test_read_mat_golden_bytes():
    mat = np.arange(12, dtype=np.float32).reshape(3, 4)
    stream = io.BytesIO(_golden_fm("utt1", mat))
    key = kio.read_key(stream)
    assert key == "utt1"
    out = kio.read_mat(stream)
    np.testing.assert_array_equal(out, mat)


def test_mat_roundtrip_f32_f64():
    rng = np.random.default_rng(0)
    for dtype in (np.float32, np.float64):
        mat = rng.standard_normal((17, 13)).astype(dtype)
        buf = io.BytesIO()
        kio.write_mat(buf, mat, key="abc")
        buf.seek(0)
        entries = list(kio.read_mat_ark(buf))
        assert len(entries) == 1
        key, out = entries[0]
        assert key == "abc"
        np.testing.assert_allclose(out, mat.astype(np.float32), rtol=1e-6)


def test_multi_entry_ark():
    buf = io.BytesIO()
    mats = {f"u{i}": np.full((i + 1, 3), i, dtype=np.float32) for i in range(4)}
    for k, m in mats.items():
        kio.write_mat(buf, m, key=k)
    buf.seek(0)
    out = dict(kio.read_mat_ark(buf))
    assert list(out) == list(mats)
    for k in mats:
        np.testing.assert_array_equal(out[k], mats[k])


def test_vec_int_roundtrip():
    vec = np.array([0, 5, 5, 5, 1917, 2, 2], dtype=np.int64)
    buf = io.BytesIO()
    kio.write_vec_int(buf, vec, key="ali1")
    buf.seek(0)
    out = dict(kio.read_vec_int_ark(buf))
    np.testing.assert_array_equal(out["ali1"], vec)


def test_vec_int_golden_bytes():
    # 2-element alignment [7, 9]
    raw = b"u \x00B\x04" + struct.pack("<i", 2)
    raw += b"\x04" + struct.pack("<i", 7) + b"\x04" + struct.pack("<i", 9)
    out = dict(kio.read_vec_int_ark(io.BytesIO(raw)))
    np.testing.assert_array_equal(out["u"], [7, 9])


def test_vec_flt_roundtrip():
    vec = np.linspace(-1, 1, 29, dtype=np.float32)
    buf = io.BytesIO()
    kio.write_vec_flt(buf, vec, key="v")
    buf.seek(0)
    out = dict(kio.read_vec_flt_ark(buf))
    np.testing.assert_allclose(out["v"], vec, rtol=1e-6)


def test_compressed_mat_cm2():
    # CM2: uint16 per entry, row-major
    rows, cols = 5, 3
    vals = np.arange(rows * cols, dtype=np.uint16)
    min_v, rng_v = -2.0, 4.0
    buf = b"k \x00B" + b"CM2" + b" "
    buf += struct.pack("<ff", min_v, rng_v) + struct.pack("<ii", rows, cols)
    buf += vals.astype("<u2").tobytes()
    out = dict(kio.read_mat_ark(io.BytesIO(buf)))["k"]
    expected = min_v + rng_v / 65535.0 * vals.astype(np.float64)
    np.testing.assert_allclose(out, expected.reshape(rows, cols), rtol=1e-5)


def test_compressed_mat_cm1():
    # format-1: per-column percentile headers + uint8 data (column-major)
    rows, cols = 4, 2
    min_v, rng_v = 0.0, 1.0
    headers = np.array(
        [[0, 16384, 49152, 65535], [0, 16384, 49152, 65535]], dtype="<u2"
    )
    data = np.array([[0, 64, 192, 255], [32, 100, 200, 255]], dtype=np.uint8)
    buf = b"k \x00B" + b"CM " + struct.pack("<ff", min_v, rng_v)
    buf += struct.pack("<ii", rows, cols)
    buf += headers.tobytes() + data.tobytes()
    out = dict(kio.read_mat_ark(io.BytesIO(buf)))["k"]
    assert out.shape == (rows, cols)
    p = headers[0].astype(np.float64) / 65535.0
    # byte 0 -> p0, byte 64 -> p25, byte 192 -> p75, byte 255 -> p100
    np.testing.assert_allclose(out[:, 0], [p[0], p[1], p[2], p[3]], atol=1e-6)


def test_text_matrix():
    raw = b"u  [\n  1 2 3 \n  4 5 6 ]\n"
    out = dict(kio.read_mat_ark(io.BytesIO(raw)))["u"]
    np.testing.assert_array_equal(out, [[1, 2, 3], [4, 5, 6]])


def test_scp_offsets(tmp_path):
    ark = tmp_path / "feats.ark"
    scp = tmp_path / "feats.scp"
    mats = {f"utt{i}": np.random.rand(6 + i, 5).astype(np.float32) for i in range(3)}
    with kio.ArkScpWriter(str(ark), str(scp)) as w:
        for k, m in mats.items():
            w.write(k, m)
    out = dict(kio.read_mat_scp(str(scp)))
    assert set(out) == set(mats)
    for k in mats:
        np.testing.assert_allclose(out[k], mats[k], rtol=1e-6)
    # random access through one scp entry
    entries = dict(kio.read_scp_entries(str(scp)))
    np.testing.assert_allclose(kio.read_mat(entries["utt1"]), mats["utt1"])


def test_riff_wav():
    samples = (np.sin(np.linspace(0, 20, 400)) * 10000).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    riff = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    riff += b"fmt " + struct.pack("<I", 16) + fmt
    riff += b"data" + struct.pack("<I", len(data)) + data
    out = kio.read_vec_flt(io.BytesIO(riff))
    np.testing.assert_array_equal(out, samples.astype(np.float32))


def test_truncated_stream_raises():
    mat = np.zeros((3, 3), dtype=np.float32)
    buf = io.BytesIO()
    kio.write_mat(buf, mat, key="u")
    raw = buf.getvalue()[:-5]
    with pytest.raises(kio.KaldiIOError):
        stream = io.BytesIO(raw)
        kio.read_key(stream)
        kio.read_mat(stream)


def test_empty_and_single_frame_entries():
    """Edge cases: zero-row matrix, single-frame matrix, empty int vector."""
    buf = io.BytesIO()
    kio.write_mat(buf, np.zeros((0, 5), dtype=np.float32), key="empty")
    kio.write_mat(buf, np.ones((1, 5), dtype=np.float32), key="one")
    buf.seek(0)
    out = dict(kio.read_mat_ark(buf))
    assert out["empty"].shape == (0, 5)
    assert out["one"].shape == (1, 5)

    buf = io.BytesIO()
    kio.write_vec_int(buf, np.array([], dtype=np.int64), key="e")
    kio.write_vec_int(buf, np.array([3], dtype=np.int64), key="s")
    buf.seek(0)
    out = dict(kio.read_vec_int_ark(buf))
    assert out["e"].shape == (0,)
    np.testing.assert_array_equal(out["s"], [3])


def test_double_matrix_and_vector():
    rng = np.random.default_rng(0)
    mat = rng.standard_normal((4, 3))
    vec = rng.standard_normal(7)
    buf = io.BytesIO()
    kio.write_mat(buf, mat, key="dm")  # float64 -> DM
    kio.write_vec_flt(buf, vec, key="dv")  # float64 -> DV
    buf.seek(0)
    key = kio.read_key(buf)
    m = kio.read_mat(buf)
    key2 = kio.read_key(buf)
    v = kio.read_vec_flt(buf)
    np.testing.assert_allclose(m, mat.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(v, vec.astype(np.float32), rtol=1e-6)


def test_cm3_roundtrip_decode():
    rows, cols = 6, 4
    vals = np.arange(rows * cols, dtype=np.uint8)
    min_v, rng_v = 0.5, 2.0
    buf = b"k \x00B" + b"CM3" + b" "
    buf += struct.pack("<ff", min_v, rng_v) + struct.pack("<ii", rows, cols)
    buf += vals.tobytes()
    out = dict(kio.read_mat_ark(io.BytesIO(buf)))["k"]
    expected = min_v + rng_v / 255.0 * vals.astype(np.float64)
    np.testing.assert_allclose(out, expected.reshape(rows, cols), rtol=1e-5)


def test_compressed_writer_roundtrip():
    rng = np.random.default_rng(5)
    mat = (rng.standard_normal((20, 13)) * 4).astype(np.float32)
    buf = io.BytesIO()
    kio.write_mat_compressed(buf, mat, key="cm")
    buf.seek(0)
    out = dict(kio.read_mat_ark(buf))["cm"]
    # 16-bit quantization over the value range
    span = mat.max() - mat.min()
    np.testing.assert_allclose(out, mat, atol=span / 65000)


def test_posterior_roundtrip(tmp_path):
    """Posterior codec (reference data_io.py:1316-1356): ark of
    vector<vector<pair<int,float>>> survives write->read, incl. via scp
    and the ark:/scp: rxspec dispatcher."""
    post1 = [[(3, 0.9), (7, 0.1)], [], [(0, 1.0)]]
    post2 = [[(1, 0.5)]]
    ark = str(tmp_path / "p.ark")
    scp = str(tmp_path / "p.scp")
    with kio.ArkScpWriter(ark, scp, writer=kio.write_post) as w:
        w.write("u1", post1)
        w.write("u2", post2)
    got = dict(kio.read_post_ark(ark))
    assert list(got) == ["u1", "u2"]
    assert got["u1"][0] == [(3, pytest.approx(0.9)), (7, pytest.approx(0.1))]
    assert got["u1"][1] == [] and got["u2"] == [[(1, pytest.approx(0.5))]]
    via_scp = dict(kio.read_post_scp(scp))
    assert via_scp["u2"] == got["u2"]
    assert dict(kio.read_post_rxspec("ark:" + ark))["u1"] == got["u1"]
    # cnet shares the wire format
    assert dict(kio.read_cnet_ark(ark))["u2"] == got["u2"]


def test_cntime_reader(tmp_path):
    """Confusion-network time pairs (data_io.py:1389-1421)."""
    import struct as st

    path = str(tmp_path / "t.ark")
    with open(path, "wb") as f:
        f.write(b"utt1 " + kio.BINARY_FLAG + b"\x04" + st.pack("<i", 2))
        for b, e in [(0.0, 0.5), (0.5, 1.25)]:
            f.write(b"\x04" + st.pack("<f", b) + b"\x04" + st.pack("<f", e))
    got = dict(kio.read_cntime_ark(path))
    assert got["utt1"] == [(0.0, 0.5), (0.5, pytest.approx(1.25))]


def test_segments_bool_vec(tmp_path):
    p = tmp_path / "segments"
    p.write_text("u1 rec1 0.00 0.50\nu2 rec1 1.00 1.20\n")
    vec = kio.read_segments_as_bool_vec(str(p))
    assert vec.shape == (120,) and vec.dtype == bool
    assert vec[:50].all() and not vec[50:100].any() and vec[100:120].all()
    # two different recordings in one file is an error
    p2 = tmp_path / "bad"
    p2.write_text("u1 rec1 0.0 0.5\nu2 rec2 1.0 1.2\n")
    with pytest.raises(kio.KaldiIOError):
        kio.read_segments_as_bool_vec(str(p2))
