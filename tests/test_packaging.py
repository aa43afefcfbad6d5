"""Packaging metadata: the framework must be pip-installable as a wheel
with working console entry points and its runtime package data (fallback
decode/scoring scripts, on-demand-compiled C++ source) shipped alongside
the Python modules.  The reference is run-from-checkout only; tpukaldi is
a library (README "Quick start") so the install surface is part of the
product."""

import importlib
import os
import tomllib

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def project():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_version_single_source(project):
    import tpukaldi

    attr = project["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    assert attr == "tpukaldi.__version__"
    assert tpukaldi.__version__
    assert "version" in project["project"]["dynamic"]


def test_console_scripts_resolve(project):
    scripts = project["project"]["scripts"]
    assert "tpukaldi-run" in scripts
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_package_data_globs_match_real_files(project):
    data = project["tool"]["setuptools"]["package-data"]
    import glob

    for pkg, patterns in data.items():
        pkg_dir = os.path.join(ROOT, *pkg.split("."))
        for pat in patterns:
            hits = glob.glob(os.path.join(pkg_dir, pat))
            assert hits, f"package-data {pkg}/{pat} matches nothing"
    # the runtime files the code actually loads are covered by the globs
    for rel in (
        "tpukaldi/decode/scripts/decode_dnn.sh",
        "tpukaldi/decode/scripts/score_wer.sh",
        "tpukaldi/decode/scripts/score_per.sh",
        "tpukaldi/native/data_ops.cc",
    ):
        assert os.path.exists(os.path.join(ROOT, rel)), rel


def test_runtime_dependencies_declared(project):
    deps = {d.split("[")[0].split(">=")[0].strip()
            for d in project["project"]["dependencies"]}
    assert {"jax", "flax", "optax", "numpy"} <= deps
    # torch is compat-only: importing the core package must not require it
    assert "torch" not in deps
