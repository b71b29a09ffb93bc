"""Web UI: submit a docking job over HTTP, poll, download results."""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

EXAMPLE_PDB = "/root/reference/examples/6w70.pdb"
EXAMPLE_SDF = "/root/reference/examples/6w70_ligand.sdf"


pytestmark = pytest.mark.slow  # compile-heavy e2e

@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from diffdock_tpu.app.server import DockingService, get_parser, make_handler

    out = tmp_path_factory.mktemp("web")
    args = get_parser().parse_args(
        ["--out_dir", str(out), "--model_preset", "diffdock_s",
         "--compute_dtype", "float32"]  # XLA:CPU has no bf16 dot
    )
    service = DockingService(args)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", service
    httpd.shutdown()


def _post_multipart(url, fields):
    boundary = "XBOUNDARYX"
    parts = []
    for name, value in fields.items():
        parts.append(
            f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="{name}"\r\n\r\n{value}\r\n'
        )
    body = ("".join(parts) + f"--{boundary}--\r\n").encode()
    req = urllib.request.Request(
        url, data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
    )
    return urllib.request.urlopen(req)


def test_index_renders(server):
    base, _ = server
    html = urllib.request.urlopen(base + "/").read().decode()
    assert "diffdock-tpu" in html


def test_submit_and_complete_job(server):
    base, service = server
    resp = _post_multipart(base + "/submit", {
        "protein_path": EXAMPLE_PDB,
        "ligand": EXAMPLE_SDF,
        "samples": "2",
        "steps": "2",
    })
    assert resp.status == 200  # after 303 redirect to /
    (job_id,) = list(service.jobs)

    # CPU compile of the full pipeline (score fwd + sampler scan) can take
    # >10 min after the round-2 feature additions; generous wall here.
    deadline = time.time() + 1800
    while time.time() < deadline:
        status = json.loads(
            urllib.request.urlopen(base + f"/status/{job_id}").read()
        )
        if status["status"] in ("done", "failed"):
            break
        time.sleep(2)
    assert status["status"] == "done", status

    listing = urllib.request.urlopen(base + f"/results/{job_id}").read().decode()
    assert "rank1.sdf" in listing
    sdf = urllib.request.urlopen(
        base + f"/results/{job_id}/rank1.sdf"
    ).read().decode()
    assert "V2000" in sdf


def test_bad_submit_rejected(server):
    base, _ = server
    try:
        _post_multipart(base + "/submit", {"samples": "2"})
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised
