"""Packaging sanity: pyproject metadata and console entry points.

The reference's "API" is editing module constants and running scripts
(reference: README.md:43, train_nele.py:30-68); here the CLIs are
installable console scripts, so the declared entry points must stay
importable and callable."""
import importlib
import os
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_parses_and_names_package():
    meta = _pyproject()
    assert meta["project"]["name"] == "nelegan-tpu"
    import nelegan_tpu
    assert meta["project"]["version"] == nelegan_tpu.__version__


def test_console_scripts_resolve_to_callables():
    scripts = _pyproject()["project"]["scripts"]
    assert len(scripts) >= 6
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), (name, target)


def test_console_scripts_accept_argv_and_print_help(capsys):
    # every CLI must support main(argv) (entry points call main with no
    # args, argparse then reads sys.argv) and --help must not crash
    import pytest
    scripts = _pyproject()["project"]["scripts"]
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        with pytest.raises(SystemExit) as e:
            getattr(mod, func_name)(["--help"])
        assert e.value.code == 0, name
        assert capsys.readouterr().out.strip(), name
