"""diffdock-tpu console entry point (pyproject [project.scripts])."""

from diffdock_tpu.cli.main import _COMMANDS, main


def test_help_lists_all_commands(capsys):
    assert main(["--help"]) == 0
    out = capsys.readouterr().out
    for name in _COMMANDS:
        assert name in out


def test_unknown_command_is_error(capsys):
    assert main(["frobnicate"]) == 2


def test_underscore_alias_dispatches(capsys):
    # argparse --help exits 0 via SystemExit; catching it proves dispatch
    # reached the submodule parser
    import pytest

    with pytest.raises(SystemExit) as e:
        main(["import_weights", "--help"])
    assert e.value.code == 0


def test_entry_point_matches_pyproject():
    import tomllib

    with open("pyproject.toml", "rb") as f:
        proj = tomllib.load(f)
    target = proj["project"]["scripts"]["diffdock-tpu"]
    mod, _, fn = target.partition(":")
    import importlib

    m = importlib.import_module(mod)
    assert callable(getattr(m, fn))
