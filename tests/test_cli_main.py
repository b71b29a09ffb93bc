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


def test_prewarm_with_confidence_model():
    """Prewarm includes the confidence apply in the warmed program
    (--confidence_preset) and dedupes repeated (bucket, P) jobs — a
    confidence-free prewarm would never match a confidence-ranked sweep's
    HLO."""
    import pytest

    pytest.importorskip("jax")
    from diffdock_tpu.cli import prewarm

    rc = prewarm.main([
        "--model_preset", "diffdock_s", "--no_cover_ladder",
        "--bucket", "16,64,4,2", "--bucket", "16,64,4,2",
        "--confidence_preset", "diffdock_s",
        "--inference_steps", "2", "--actual_steps", "2",
        "--compute_dtype", "float32",
    ])
    assert rc == 0


test_prewarm_with_confidence_model = __import__("pytest").mark.slow(
    test_prewarm_with_confidence_model
)


def test_restrict_cpu_caps_pools_before_import(monkeypatch):
    """The dispatcher must export the thread caps before the heavy
    subcommand module imports numpy/torch (reference evaluate.py:186-196
    sets them pre-import)."""
    import os

    from diffdock_tpu.cli.main import _apply_restrict_cpu

    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS"):
        monkeypatch.delenv(var, raising=False)
    _apply_restrict_cpu(["evaluate", "--restrict_cpu", "--num_cpu", "3"])
    assert os.environ["OMP_NUM_THREADS"] == "3"
    assert os.environ["OPENBLAS_NUM_THREADS"] == "3"
    monkeypatch.delenv("OMP_NUM_THREADS")
    _apply_restrict_cpu(["evaluate"])  # no flag -> no exports
    assert "OMP_NUM_THREADS" not in os.environ
