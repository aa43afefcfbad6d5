"""Transition-model parser tests: synthetic 3-state Bakis topology written
in Kaldi binary layout, id->pdf/phone maps checked by hand, ali-to-pdf /
ali-to-phones / hmm-info native paths end to end."""

import gzip
import io
import os

import numpy as np

from tpukaldi.io.transition_model import (
    HmmState,
    TransitionModel,
    hmm_info,
    read_transition_model,
    write_transition_model,
)


def _bakis_entry():
    """3 emitting states, self-loop + forward transitions, final state 3."""
    return [
        HmmState(0, 0, [(0, 0.5), (1, 0.5)]),
        HmmState(1, 1, [(1, 0.5), (2, 0.5)]),
        HmmState(2, 2, [(2, 0.5), (3, 0.5)]),
    ]


def _make_tm(n_phones=3):
    entry = _bakis_entry()
    phones = list(range(1, n_phones + 1))
    topology = {p: entry for p in phones}
    tuples = []
    pdf = 0
    for p in phones:
        for state in range(3):
            tuples.append((p, state, pdf, pdf))
            pdf += 1
    # derive id maps through the writer+reader round trip
    id2pdf = [0]
    id2phone = [0]
    for phone, state, fwd, selfp in tuples:
        for nxt, _ in entry[state].transitions:
            id2pdf.append(selfp if nxt == state else fwd)
            id2phone.append(phone)
    return TransitionModel(
        phones=phones,
        topology=topology,
        tuples=tuples,
        id2pdf=np.array(id2pdf),
        id2phone=np.array(id2phone),
    )


def test_roundtrip_and_maps(tmp_path):
    tm = _make_tm()
    path = str(tmp_path / "final.mdl")
    write_transition_model(tm, path)
    tm2 = read_transition_model(path)
    assert tm2.phones == [1, 2, 3]
    assert tm2.num_pdfs == 9
    assert tm2.num_phones == 3
    # 2 transitions per state, 3 states per phone, 3 phones = 18 ids
    assert tm2.num_transition_ids == 18
    np.testing.assert_array_equal(tm2.id2pdf, tm.id2pdf)
    np.testing.assert_array_equal(tm2.id2phone, tm.id2phone)
    # hand check: tid 1 = phone1 state0 self-loop -> pdf 0;
    # tid 2 = phone1 state0 forward -> pdf 0 (Triples share pdf);
    # tid 7 = phone2 state0 self-loop -> pdf 3
    assert tm2.id2pdf[1] == 0 and tm2.id2pdf[7] == 3
    assert tm2.id2phone[7] == 2


def test_ali_to_pdf_and_phones(tmp_path):
    tm = _make_tm()
    ali = np.array([1, 1, 2, 7, 8, 13, 14, 18])
    pdfs = tm.transition_ids_to_pdfs(ali)
    np.testing.assert_array_equal(pdfs, [0, 0, 0, 3, 3, 6, 6, 8])
    phones = tm.transition_ids_to_phones(ali)
    np.testing.assert_array_equal(phones, [1, 1, 1, 2, 2, 3, 3, 3])


def test_label_stream_native_ali_to_pdf(tmp_path):
    """read_label_stream resolves ali.gz + final.mdl natively (no Kaldi)."""
    from tpukaldi.data.labels import read_label_stream
    from tpukaldi.io import kaldi_io as kio

    tm = _make_tm()
    folder = tmp_path / "alidir"
    folder.mkdir()
    write_transition_model(tm, str(folder / "final.mdl"))
    buf = io.BytesIO()
    rng = np.random.default_rng(0)
    alis = {
        f"utt{i}": rng.integers(1, 19, 30) for i in range(3)
    }
    for k, v in alis.items():
        kio.write_vec_int(buf, v, key=k)
    with gzip.open(folder / "ali.1.gz", "wb") as f:
        f.write(buf.getvalue())

    labs = read_label_stream(str(folder), "ali-to-pdf")
    assert set(labs) == set(alis)
    for k in alis:
        np.testing.assert_array_equal(
            labs[k], tm.transition_ids_to_pdfs(alis[k])
        )
    phones = read_label_stream(str(folder), "ali-to-phones --per-frame=true")
    for k in alis:
        np.testing.assert_array_equal(
            phones[k], tm.transition_ids_to_phones(alis[k])
        )


def test_hmm_info_and_n_out_substitution(tmp_path):
    from tpukaldi.config.cfg import _n_out_from_hmm_info

    tm = _make_tm(n_phones=4)
    folder = tmp_path / "alidir"
    folder.mkdir()
    write_transition_model(tm, str(folder / "final.mdl"))
    info = hmm_info(str(folder / "final.mdl"))
    assert info["number of pdfs"] == 12
    assert info["number of phones"] == 4
    assert _n_out_from_hmm_info(str(folder), "cd") == 12
    assert _n_out_from_hmm_info(str(folder), "mono") == 4
