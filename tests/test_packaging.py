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


def test_compilation_cache_dir_is_host_keyed(tmp_path, monkeypatch):
    """XLA:CPU AOT entries are specialised to the compiling machine's CPU
    features; a host with different features rejects every entry on load
    (cpu_aot_loader "machine type doesn't match", measured when round 2's
    box filled the cache and round 3's box paid a warning-spew rejection
    per entry).  Driver hosts change between rounds, so the cache
    directory must be keyed per host."""
    from nelegan_tpu.utils.cache import (_host_fingerprint,
                                         enable_compilation_cache)
    import jax
    monkeypatch.setenv("NELE_COMPILE_CACHE", str(tmp_path / "c"))
    try:
        d = enable_compilation_cache()
        assert d is not None and os.path.isdir(d)
        fp = _host_fingerprint()
        assert os.path.basename(d) == f"host-{fp}"
        assert len(fp) == 12
        assert _host_fingerprint() == fp       # stable within a host
        monkeypatch.setenv("NELE_COMPILE_CACHE", "off")
        assert enable_compilation_cache() is None
    finally:
        # tmp_path is deleted after the test — don't leave the process
        # pointed at it (conftest runs the suite with the cache off)
        jax.config.update("jax_compilation_cache_dir", None)
