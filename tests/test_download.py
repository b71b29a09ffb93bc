"""Weight auto-download + reference-dir conversion (utils/download.py).

Mirrors the reference contract — try release URLs in order, swallow
per-URL failures, extract the zip next to the requested dir, raise when
everything failed (reference inference.py:50-54,123-143,
utils/download.py:8-14) — with the network mocked (offline image).
"""

import io
import os
import zipfile

import numpy as np
import pytest
import yaml

from diffdock_tpu.utils.download import (
    DEFAULT_CKPT,
    NATIVE_SUBDIR,
    REMOTE_URLS,
    download_and_extract,
    ensure_downloaded,
    is_reference_format,
    prepare_model_dir,
)


class _Resp:
    def __init__(self, payload: bytes):
        self._payload = payload

    def read(self):
        return self._payload


def _zip_bytes(files):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in files.items():
            zf.writestr(name, content)
    return buf.getvalue()


def _fake_opener(payload, calls):
    def opener(url, timeout):
        calls.append(url)
        return _Resp(payload)

    return opener


def test_download_and_extract(tmp_path):
    payload = _zip_bytes({
        "run/model_parameters.yml": "ns: 48\n",
        "run/best_ema_inference_epoch_model.pt": b"\x00",
    })
    calls = []
    files = download_and_extract(
        "http://example/models.zip", str(tmp_path), _fake_opener(payload, calls)
    )
    assert sorted(files) == [
        "run/best_ema_inference_epoch_model.pt", "run/model_parameters.yml",
    ]
    assert (tmp_path / "run" / "model_parameters.yml").read_text() == "ns: 48\n"
    assert calls == ["http://example/models.zip"]


def test_ensure_downloaded_noop_when_present(tmp_path):
    d = tmp_path / "workdir" / "score_model"
    d.mkdir(parents=True)
    calls = []
    assert ensure_downloaded(
        str(d), opener=_fake_opener(b"not-a-zip", calls)
    ) == []
    assert calls == []  # no network touch when the dir exists


def test_ensure_downloaded_fallback_url(tmp_path):
    """First URL fails, second succeeds — per-URL failures are swallowed
    (reference inference.py:128-140)."""
    target = tmp_path / "workdir" / "score_model"
    payload = _zip_bytes({"score_model/model_parameters.yml": "ns: 16\n"})
    calls = []
    good = _fake_opener(payload, calls)

    def opener(url, timeout):
        if len(calls) == 0:
            calls.append(url)
            raise OSError("connection refused")
        return good(url, timeout)

    files = ensure_downloaded(str(target), opener=opener)
    assert files == ["score_model/model_parameters.yml"]
    assert len(calls) == 2 and calls[0] == REMOTE_URLS[0]
    # extracted into the PARENT of model_dir, so the dir now exists
    assert (target / "model_parameters.yml").exists()


def test_ensure_downloaded_all_fail(tmp_path):
    def opener(url, timeout):
        raise OSError("no egress")

    with pytest.raises(RuntimeError, match="failed to download"):
        ensure_downloaded(str(tmp_path / "missing"), opener=opener)


def _make_reference_dir(tmp_path):
    d = tmp_path / "ref_run"
    d.mkdir()
    # flat reference-args yml (no nested `model:` key) + torch weights
    (d / "model_parameters.yml").write_text(
        yaml.safe_dump({"ns": 16, "nv": 4, "all_atoms": False})
    )
    (d / DEFAULT_CKPT).write_bytes(b"\x80")
    return d


def test_is_reference_format(tmp_path):
    ref = _make_reference_dir(tmp_path)
    assert is_reference_format(str(ref))
    assert not is_reference_format(str(tmp_path / "does_not_exist"))

    # a native dir: nested `model:` yml + msgpack weights
    from diffdock_tpu.models.config import ScoreModelConfig
    from diffdock_tpu.train.checkpoints import save_checkpoint

    native = tmp_path / "native_run"
    save_checkpoint(
        str(native),
        {"params": {"w": np.zeros(2, np.float32)}, "batch_stats": {}},
        ScoreModelConfig(ns=8, nv=2),
    )
    assert not is_reference_format(str(native))
    assert prepare_model_dir(str(native)) == str(native)  # passthrough


def test_prepare_model_dir_converts_once(tmp_path, monkeypatch):
    ref = _make_reference_dir(tmp_path)
    native = os.path.join(str(ref), NATIVE_SUBDIR)
    seen = []

    def fake_import(argv):
        seen.append(list(argv))
        i = argv.index("--out_dir")
        os.makedirs(argv[i + 1], exist_ok=True)
        with open(os.path.join(argv[i + 1], "model.msgpack"), "wb") as f:
            f.write(b"converted")
        return 0

    import diffdock_tpu.cli.import_weights as iw

    monkeypatch.setattr(iw, "main", fake_import)
    out = prepare_model_dir(str(ref), confidence_mode=True, old=True)
    # conversion subdirs are keyed by the importer flags...
    assert out == native + "_conf_old"
    assert seen and "--confidence_mode" in seen[0] and "--old" in seen[0]
    assert seen[0][seen[0].index("--torch_checkpoint") + 1] == str(
        ref / DEFAULT_CKPT
    )

    # cached: the same request returns the converted dir without importing
    out2 = prepare_model_dir(str(ref), confidence_mode=True, old=True)
    assert out2 == out and len(seen) == 1

    # ...and by the checkpoint file: a different --ckpt converts anew into
    # its own subdir instead of silently serving the cached default
    (ref / "last_model.pt").write_bytes(b"torch2")
    out3 = prepare_model_dir(str(ref), ckpt="last_model.pt")
    assert out3 == native + "_last_model" and len(seen) == 2
    assert seen[1][seen[1].index("--torch_checkpoint") + 1] == str(
        ref / "last_model.pt"
    )

    # default request converts the default checkpoint into tpu_native/
    out4 = prepare_model_dir(str(ref))
    assert out4 == native and len(seen) == 3

    # a cache whose recorded source mismatches the request is an error,
    # not a silent wrong-weights load
    with open(os.path.join(out4, "SOURCE"), "w") as f:
        f.write("something_else.pt confidence=False old=False\n")
    import pytest

    with pytest.raises(RuntimeError, match="different source"):
        prepare_model_dir(str(ref))

    # a legacy (pre-keying) cache with no SOURCE record is unverifiable:
    # it must be reconverted with a warning, NOT stamped with the current
    # request's flags (which could mislabel a conversion made with
    # different flags — ADVICE r3)
    os.remove(os.path.join(out4, "SOURCE"))
    with pytest.warns(RuntimeWarning, match="no SOURCE provenance"):
        out5 = prepare_model_dir(str(ref))
    assert out5 == native and len(seen) == 4  # reconverted
    with open(os.path.join(out5, "SOURCE")) as f:
        assert f.read().startswith(DEFAULT_CKPT)
    # and the freshly stamped cache is served without reconverting
    assert prepare_model_dir(str(ref)) == native and len(seen) == 4
