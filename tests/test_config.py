"""Config-system tests: proto validation, scheduler syntax, model DSL static
checks, CLI overrides, production detection, N_out substitution."""

import numpy as np
import pytest

from tpukaldi.config import cfg as C
from tpukaldi.config import model_dsl, protos
from tpukaldi.config.schema import ConfigError, make_checker
from tpukaldi.config.scheduler import expand_layerwise_schedule, expand_schedule


def _write_min_corpus(tmp_path, n_utts=3, dim=13, n_out=10):
    """Tiny synthetic data dir: feats ark+scp, labels pre-dumped ark, counts."""
    from tpukaldi.io import ArkScpWriter, save_counts, write_vec_int

    rng = np.random.default_rng(0)
    feadir = tmp_path / "data"
    feadir.mkdir(exist_ok=True)
    with ArkScpWriter(str(feadir / "feats.ark"), str(feadir / "feats.scp")) as w:
        for i in range(n_utts):
            w.write(f"utt{i}", rng.standard_normal((60 + 10 * i, dim)).astype(np.float32))
    labdir = tmp_path / "lab"
    labdir.mkdir(exist_ok=True)
    with open(labdir / "labels.ark", "wb") as f:
        for i in range(n_utts):
            write_vec_int(f, rng.integers(0, n_out, 60 + 10 * i), key=f"utt{i}")
    save_counts(np.ones(n_out), str(labdir / "counts"))
    return feadir, labdir


def make_cfg(tmp_path, n_out=10, extra=""):
    feadir, labdir = _write_min_corpus(tmp_path, n_out=n_out)
    cfg = f"""
[cfg_proto]
cfg_proto = proto/global.proto
cfg_proto_chunk = proto/global_chunk.proto

[exp]
cmd =
run_nn_script = run_nn
out_folder = {tmp_path}/exp
seed = 1234
use_cuda = False
multi_gpu = False
save_gpumem = False
n_epochs_tr = 4

[dataset1]
data_name = tr
fea = fea_name=mfcc
\tfea_lst={feadir}/feats.scp
\tfea_opts=copy-feats ark:- ark:- |
\tcw_left=2
\tcw_right=2

lab = lab_name=lab_cd
\tlab_folder={labdir}
\tlab_opts=ali-to-pdf
\tlab_count_file={labdir}/counts
\tlab_data_folder={feadir}
\tlab_graph=none

n_chunks = 2

[data_use]
train_with = tr
valid_with = tr
forward_with = tr

[batches]
batch_size_train = 16*2|8*2
max_seq_length_train = 1000
increase_seq_length_train = False
start_seq_len_train = 100
multply_factor_seq_len_train = 2
batch_size_valid = 8
max_seq_length_valid = 1000

[architecture1]
arch_name = MLP_layers1
arch_proto = proto/MLP.proto
arch_library = tpukaldi.models
arch_class = MLP
arch_pretrain_file = none
arch_freeze = False
arch_seq_model = False
dnn_lay = 32,N_out_lab_cd
dnn_drop = 0.15*2|0.1*2,0.0
dnn_use_laynorm_inp = False
dnn_use_batchnorm_inp = False
dnn_use_batchnorm = True,False
dnn_use_laynorm = False,False
dnn_act = relu,softmax
arch_lr = 0.08*2|0.04*2
arch_halving_factor = 0.5
arch_improvement_threshold = 0.001
arch_opt = sgd
opt_momentum = 0.0
opt_weight_decay = 0.0
opt_dampening = 0.0
opt_nesterov = False

[model]
model_proto = proto/model.proto
model = out_dnn1=compute(MLP_layers1,mfcc)
\tloss_final=cost_nll(out_dnn1,lab_cd)
\terr_final=cost_err(out_dnn1,lab_cd)

[forward]
forward_out = out_dnn1
normalize_posteriors = True
normalize_with_counts_from = {labdir}/counts
save_out_file = False
require_decoding = True
{extra}
"""
    path = tmp_path / "exp.cfg"
    path.write_text(cfg)
    return str(path)


def test_load_full_config(tmp_path):
    exp = C.load_config(make_cfg(tmp_path))
    assert exp.n_epochs == 4
    assert exp.batches.batch_size_train == [16, 16, 8, 8]
    arch = exp.archs["MLP_layers1"]
    assert arch.lr == [0.08, 0.08, 0.04, 0.04]
    # N_out_lab_cd resolved from the count file (10 classes)
    assert arch.options["dnn_lay"] == "32,10"
    # per-layer dropout schedule: layer 0 scheduled, layer 1 constant
    assert arch.drop_schedules[0] == [0.15, 0.15, 0.1, 0.1]
    assert arch.drop_schedules[1] == [0.0] * 4
    assert not exp.production
    assert [str(s) for s in exp.model] == [
        "out_dnn1=compute(MLP_layers1,mfcc)",
        "loss_final=cost_nll(out_dnn1,lab_cd)",
        "err_final=cost_err(out_dnn1,lab_cd)",
    ]


def test_cli_overrides(tmp_path):
    path = make_cfg(tmp_path)
    exp = C.load_config(path, overrides=["--exp,seed=99", "--batches,batch_size_valid=4"])
    assert exp.seed == 99
    assert exp.batches.batch_size_valid == 4


def test_cli_override_4level(tmp_path):
    path = make_cfg(tmp_path)
    config = C.read_ini(path)
    C.apply_overrides(config, ['--dataset1,fea,0,cw_left="3"'])
    assert "cw_left=3" in config["dataset1"]["fea"]


def test_bad_override_rejected(tmp_path):
    path = make_cfg(tmp_path)
    with pytest.raises(ConfigError):
        C.load_config(path, overrides=["--nosection,x=1"])
    with pytest.raises(ConfigError):
        C.load_config(path, overrides=["--exp,nofield=1"])


def test_production_detection(tmp_path):
    path = make_cfg(tmp_path)
    config_text = open(path).read().replace(
        "lab = lab_name=lab_cd", "lab = lab_name=none\nXXdummy=1"
    )
    # rewrite dataset1 to have no labels -> production
    prod_path = tmp_path / "prod.cfg"
    prod_path.write_text(config_text)
    config = C.read_ini(str(prod_path))
    assert C._detect_production(config, ["tr"])


def test_schedule_expansion():
    assert expand_schedule("0.08", 3, float) == [0.08, 0.08, 0.08]
    assert expand_schedule("5*2|3*1", 3, int) == [5, 5, 3]
    with pytest.raises(ConfigError):
        expand_schedule("5*2|3", 4, int)  # expands to 3 != 4
    assert expand_layerwise_schedule("0.1*2,0.2|0.3", 2) == [[0.1, 0.1], [0.2, 0.3]]


def test_checker_types():
    assert make_checker("int(1,inf)")("5", "f") == 5
    with pytest.raises(ConfigError):
        make_checker("int(1,inf)")("0", "f")
    assert make_checker("{sgd,adam}")("adam", "f") == "adam"
    with pytest.raises(ConfigError):
        make_checker("{sgd,adam}")("lbfgs", "f")
    assert make_checker("bool_list")("True,false,1", "f") == [True, False, True]
    assert make_checker("float_list(0,1)")("0.5,0.25", "f") == [0.5, 0.25]


def test_model_dsl_static_errors():
    stmts = model_dsl.parse_model(
        "out=compute(arch1,mfcc)\nloss_final=cost_nll(out,lab)\nerr_final=cost_err(out,lab)"
    )
    model_dsl.validate_model(stmts, ["mfcc"], ["lab"], ["arch1"])
    with pytest.raises(ConfigError):
        model_dsl.validate_model(stmts, ["fbank"], ["lab"], ["arch1"])  # mfcc undefined
    with pytest.raises(ConfigError):
        model_dsl.validate_model(stmts, ["mfcc"], ["lab"], ["other"])  # unknown arch
    with pytest.raises(ConfigError):
        model_dsl.parse_model("out=explode(a,b)")
    with pytest.raises(ConfigError):  # missing err_final
        model_dsl.validate_model(
            model_dsl.parse_model("loss_final=cost_nll(mfcc,lab)"), ["mfcc"], ["lab"], []
        )


def test_builtin_protos_cover_reference_set():
    for name in [
        "global.proto", "global_chunk.proto", "MLP.proto", "LSTM.proto",
        "GRU.proto", "liGRU.proto", "minimalGRU.proto", "RNN.proto",
        "CNN.proto", "SincNet.proto", "SRU.proto", "QLSTM.proto",
        "PASE.proto", "logMelFb.proto", "channelAvg.proto",
        "LSTM_cudnn.proto", "GRU_cudnn.proto", "RNN_cudnn.proto",
        "sgd.proto", "adam.proto", "rmsprop.proto", "decoding.proto",
    ]:
        assert protos.resolve_proto(name), name


def test_missing_field_rejected(tmp_path):
    path = make_cfg(tmp_path)
    text = open(path).read().replace("arch_halving_factor = 0.5\n", "")
    bad = tmp_path / "bad.cfg"
    bad.write_text(text)
    with pytest.raises(ConfigError, match="halving"):
        C.load_config(str(bad))


def test_missing_dataset_field_is_config_error(tmp_path):
    """A [dataset*] section missing a required field must raise ConfigError
    (the documented embeddability contract), not a raw KeyError."""
    from tpukaldi.config import ConfigError, load_config
    from tpukaldi.data.synth import generate_corpus, write_cfg

    corpus = generate_corpus(str(tmp_path / "c"), n_utts=4, seed=0)
    cfg = write_cfg(corpus, str(tmp_path / "e"), arch="MLP")
    text = open(cfg).read()
    import re

    text = re.sub(r"^n_chunks = .*$", "", text, count=1, flags=re.M)
    bad = tmp_path / "bad.cfg"
    bad.write_text(text)
    with pytest.raises(ConfigError, match="n_chunks"):
        load_config(str(bad))


def test_forward_with_none_disables_forward(tmp_path):
    """`forward_with = none` = train-only experiment (no posterior stage) —
    the data_use analog of the reference's `lab_name = none` convention."""
    path = make_cfg(tmp_path)
    text = open(path).read().replace("forward_with = tr", "forward_with = none")
    open(path, "w").write(text)
    exp = C.load_config(path)
    assert exp.forward_with == []
    assert not exp.production
    from tpukaldi.plan.planner import build_plan

    assert build_plan(exp).forward_tasks == []
