"""Serving surface: the HTTP layout-generation service end-to-end (in-process
server over a loopback socket)."""

import json
import threading
import urllib.request
from http.server import HTTPServer

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    """Train a tiny job (debug), then serve it."""
    import jax

    from layoutdm_tpu.configs import build_train_config
    from layoutdm_tpu.serve_cli import LayoutService, make_handler
    from layoutdm_tpu.train.loop import train

    job_dir = str(tmp_path_factory.mktemp("serve") / "job")
    cfg = build_train_config(
        "layoutdm", "synthetic", [f"job_dir={job_dir}", "debug=true", "seed=0"]
    )
    cfg.dataset.max_seq_length = 4
    cfg.backbone.d_model = 64
    cfg.backbone.nhead = 2  # 64 shrinks 29/32 -> 58, divisible by 2
    cfg.backbone.dim_feedforward = 64
    cfg.backbone.num_layers = 1
    cfg.model.num_timesteps = 4
    cfg.backbone.diffusion_step = 4
    train(cfg)

    service = LayoutService(job_dir, max_batch_size=4, timestep_ladder=(2,))
    httpd = HTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz") as r:
        out = json.loads(r.read())
    assert out["status"] == "ok"
    assert out["max_batch_size"] == 4


def test_generate_unconditional(server_url):
    code, out = _post(server_url, {"task": "unconditional", "batch_size": 3,
                                   "seed": 1})
    assert code == 200
    assert len(out["layouts"]) == 3
    for lay in out["layouts"]:
        assert len(lay["label"]) == len(lay["bbox"])
        for b in lay["bbox"]:
            assert len(b) == 4 and all(0.0 <= v <= 1.0 for v in b)
    assert out["ms_per_sample"] > 0


def test_generate_conditional_c(server_url):
    layout = {"label": [1, 2], "bbox": [[0.5, 0.2, 0.3, 0.1],
                                        [0.5, 0.7, 0.4, 0.2]]}
    code, out = _post(
        server_url,
        {"task": "c", "batch_size": 2, "seed": 2, "layout": layout},
    )
    assert code == 200
    # conditioned on categories: every sample keeps the given label multiset
    for lay in out["layouts"]:
        assert sorted(lay["label"]) == [1, 2]


def test_generate_seed_determinism(server_url):
    a = _post(server_url, {"task": "unconditional", "batch_size": 2, "seed": 7})
    b = _post(server_url, {"task": "unconditional", "batch_size": 2, "seed": 7})
    assert a[1]["layouts"] == b[1]["layouts"]


def test_generate_timestep_ladder(server_url):
    # healthz advertises the ladder
    with urllib.request.urlopen(server_url + "/healthz") as r:
        assert json.loads(r.read())["timestep_ladder"] == [2]
    # a ladder value runs the precompiled skip-step program
    code, out = _post(
        server_url,
        {"task": "unconditional", "batch_size": 2, "seed": 3,
         "num_timesteps": 2},
    )
    assert code == 200 and len(out["layouts"]) == 2
    # non-ladder values are rejected, not compiled
    code, out = _post(
        server_url,
        {"task": "unconditional", "batch_size": 2, "num_timesteps": 3},
    )
    assert code == 400 and "ladder" in out["error"]


def test_generate_bad_requests(server_url):
    code, out = _post(server_url, {"task": "nope"})
    assert code == 400 and "unknown task" in out["error"]
    code, out = _post(server_url, {"task": "c"})  # missing layout
    assert code == 400 and "layout" in out["error"]
    code, out = _post(server_url, {"task": "unconditional", "batch_size": 0})
    assert code == 400
    # unknown path
    try:
        urllib.request.urlopen(server_url + "/nope")
        assert False
    except urllib.error.HTTPError as e:
        assert e.code == 404
