"""Persistent-compilation-cache plumbing."""

import os

import diffdock_tpu.utils.compile_cache as cc


def test_enable_persistent_cache(tmp_path, monkeypatch):
    monkeypatch.delenv("DIFFDOCK_TPU_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(cc, "_enabled", False)

    import jax

    prev = jax.config.jax_compilation_cache_dir
    d = str(tmp_path / "xla_cache")
    try:
        got = cc.enable_persistent_cache(d)
        if jax.default_backend() == "cpu":
            # gated off on CPU (XLA:CPU AOT machine-feature mismatch risk)
            assert got is None and not os.path.isdir(d)
            return
        assert got == d and os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        # idempotent
        assert cc.enable_persistent_cache(d) == d
    finally:
        # jax.config is process-global: restore for the rest of the session
        jax.config.update("jax_compilation_cache_dir", prev)
        monkeypatch.setattr(cc, "_enabled", False)


def test_env_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("DIFFDOCK_TPU_NO_COMPILE_CACHE", "1")
    monkeypatch.setattr(cc, "_enabled", False)
    assert cc.enable_persistent_cache(str(tmp_path / "x")) is None
    assert not os.path.isdir(str(tmp_path / "x"))
