"""Behavioral parity against the reference's pure host functions and the
quaternion QLSTM (imported directly from /root/reference, torch-CPU)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree absent"
)
if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import data_io as ref_data_io  # noqa: E402
    import utils as ref_utils  # noqa: E402


def test_splice_matches_reference_context_window():
    from tpukaldi.io.feats import splice

    rng = np.random.default_rng(0)
    fea = rng.standard_normal((60, 13))
    for left, right in [(1, 1), (5, 5), (3, 0), (0, 2)]:
        want = ref_data_io.context_window(fea, left, right)
        got = splice(fea.astype(np.float32), left, right)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_split_chunks_matches_reference():
    from tpukaldi.plan import split_chunks

    for n, k in [(10, 3), (12, 5), (7, 7), (100, 9)]:
        seq = list(range(n))
        assert split_chunks(seq, k) == ref_utils.split_chunks(seq, k)


def test_validation_points_match_reference():
    from tpukaldi.plan import validation_points

    for n_ck, n_val in [(5, 1), (10, 2), (7, 3), (4, 4)]:
        want = ref_utils.get_chunks_after_which_to_validate(n_ck, n_val)
        assert validation_points(n_ck, n_val) == want


def test_expand_schedule_matches_reference():
    from tpukaldi.config import expand_schedule

    cases = [
        ("0.08", 5, "float"),
        ("0.08*3|0.04*2", 5, "float"),
        ("128", 4, "int"),
        ("64*2|32*1|16*1", 4, "int"),
    ]
    for compact, n_ep, kind in cases:
        want = ref_utils.expand_str_ep(compact, kind, n_ep, "|", "*")
        cast = float if kind == "float" else int
        got = expand_schedule(compact, n_ep, cast=cast)
        assert [cast(w) for w in want] == got


def test_delta_scales_match_kaldi_convention():
    """The reference delegates deltas to Kaldi; our coefficients must match
    the published Kaldi defaults (window 2 slope filter)."""
    from tpukaldi.io.feats import _delta_scales

    scales = _delta_scales(2, 2)
    np.testing.assert_allclose(scales[0], [1.0])
    np.testing.assert_allclose(scales[1], np.array([-2, -1, 0, 1, 2]) / 10.0)
    # order-2 = slope filter convolved with itself
    np.testing.assert_allclose(
        scales[2], np.convolve(scales[1], scales[1]), atol=1e-12
    )


def test_qlstm_matches_reference():
    import jax
    import jax.numpy as jnp
    import quaternion_neural_networks as ref_qnn
    import torch

    from tpukaldi.models import QLSTM

    T, B, D, H = 9, 2, 8, 12
    opts = {
        "lstm_lay": str(H),
        "lstm_drop": "0.0",
        "lstm_bidir": "True",
        "lstm_act": "tanh",
        "quaternion_init": "quaternion",
        "autograd": "True",
        "use_cuda": "False",
        "to_do": "forward",
    }
    ref = ref_qnn.QLSTM(opts, D).eval()
    x = np.random.default_rng(1).standard_normal((T, B, D)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    ours = QLSTM(options=opts, inp_dim=D)
    v = ours.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    p = dict(v["params"])

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    gate_map = {"f": (ref.wfx, ref.ufh), "i": (ref.wix, ref.uih),
                "o": (ref.wox, ref.uoh), "c": (ref.wcx, ref.uch)}
    for g, (wlist, ulist) in gate_map.items():
        wref = wlist[0]
        sub = dict(p[f"w{g}x0"])
        sub["r"] = t2j(wref.r_weight)
        sub["i"] = t2j(wref.i_weight)
        sub["j"] = t2j(wref.j_weight)
        sub["k"] = t2j(wref.k_weight)
        sub["bias"] = t2j(wref.bias)
        p[f"w{g}x0"] = sub
        uref = ulist[0]
        p[f"u{g}h0"] = jnp.stack(
            [t2j(uref.r_weight), t2j(uref.i_weight), t2j(uref.j_weight),
             t2j(uref.k_weight)]
        )
    got = np.asarray(ours.apply({"params": p}, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
