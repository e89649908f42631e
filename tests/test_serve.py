"""Serving surface: the HTTP layout-generation service end-to-end (in-process
server over a loopback socket)."""

import json
import threading
import urllib.request
from http.server import HTTPServer

import numpy as np
import pytest


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    """Train a tiny job (debug), then build the service around it."""
    from layoutdm_tpu.configs import build_train_config
    from layoutdm_tpu.serve_cli import LayoutService
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

    svc = LayoutService(
        job_dir, max_batch_size=4, timestep_ladder=(2,),
        coalesce_window_ms=100.0,
    )
    yield svc
    svc.close()


@pytest.fixture(scope="module")
def server_url(service):
    """Threaded HTTP front over the shared service: concurrent requests
    queue at the coalescer, not in the socket backlog."""
    from layoutdm_tpu.serve_cli import LayoutHTTPServer, make_handler

    httpd = LayoutHTTPServer(("127.0.0.1", 0), make_handler(service))
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


def test_generate_relation(server_url):
    """Relation task over HTTP: client-specified pairwise constraints steer
    CLG-LO guidance; the response reports the violation rate."""
    layout = {"label": [1, 2]}  # bbox optional: relation conditions on labels
    relations = [
        {"src": "canvas", "dst": 0, "loc": "top"},
        {"src": 0, "dst": 1, "size": "larger", "loc": "bottom"},
    ]
    code, out = _post(
        server_url,
        {"task": "relation", "batch_size": 2, "seed": 5, "layout": layout,
         "relations": relations},
    )
    assert code == 200
    assert len(out["layouts"]) == 2
    for lay in out["layouts"]:
        assert sorted(lay["label"]) == [1, 2]
    assert 0.0 <= out["violation_rate"] <= 1.0
    # deterministic like every other task
    again = _post(
        server_url,
        {"task": "relation", "batch_size": 2, "seed": 5, "layout": layout,
         "relations": relations},
    )
    assert again[1]["layouts"] == out["layouts"]


def test_generate_relation_bad_requests(server_url):
    layout = {"label": [1, 2]}
    # missing relations
    code, out = _post(
        server_url, {"task": "relation", "layout": layout})
    assert code == 400 and "relations" in out["error"]
    # dst out of range
    code, out = _post(
        server_url,
        {"task": "relation", "layout": layout,
         "relations": [{"src": 0, "dst": 9, "loc": "left"}]},
    )
    assert code == 400 and "out of range" in out["error"]
    # neither size nor loc
    code, out = _post(
        server_url,
        {"task": "relation", "layout": layout,
         "relations": [{"src": 0, "dst": 1}]},
    )
    assert code == 400 and "size" in out["error"]
    # canvas as dst
    code, out = _post(
        server_url,
        {"task": "relation", "layout": layout,
         "relations": [{"src": 0, "dst": "canvas", "loc": "left"}]},
    )
    assert code == 400 and "canvas" in out["error"]
    # unknown vocabulary
    code, out = _post(
        server_url,
        {"task": "relation", "layout": layout,
         "relations": [{"src": 0, "dst": 1, "loc": "beneath"}]},
    )
    assert code == 400 and "beneath" in out["error"]


def test_concurrent_requests(server_url):
    """The single-threaded server under concurrent clients: every request is
    answered (queuing rides the listen backlog) and per-seed determinism
    holds regardless of arrival order."""
    import threading

    results = {}

    def worker(i):
        seed = 100 + (i % 3)  # collide seeds across threads on purpose
        results[i] = (seed, _post(
            server_url,
            {"task": "unconditional", "batch_size": 2, "seed": seed},
        ))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 8
    by_seed = {}
    for i, (seed, (code, out)) in results.items():
        assert code == 200, out
        assert len(out["layouts"]) == 2
        by_seed.setdefault(seed, out["layouts"])
        # same seed -> identical layouts, no matter which thread/when
        assert out["layouts"] == by_seed[seed]


def test_coalescing_merges_concurrent_requests(service):
    """Concurrent same-lane requests share one compiled program run, and a
    coalesced row equals the same request run alone — the end-to-end
    batch-composition-independence property of per-row seeding."""
    solo = service.generate("unconditional", 1, seed=777, layout=None)
    runs0 = service.runs
    results = {}

    def worker(i):
        results[i] = service.generate(
            "unconditional", 1, seed=777 + i, layout=None
        )

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 4
    # 4 batch-1 requests fit one width-4 program: at least one merge
    assert service.runs - runs0 < 4
    # the coalesced seed-777 row is identical to its solo run
    assert results[0]["layouts"] == solo["layouts"]


def test_mixed_tasks_coalesce_correctly(service):
    """c and cwh rows share the conditional lane; each keeps its own
    constraints when coalesced into one run."""
    layout = {"label": [1, 2], "bbox": [[0.5, 0.5, 0.2, 0.2],
                                        [0.3, 0.3, 0.4, 0.1]]}
    results = {}

    def worker(task):
        results[task] = service.generate(task, 1, seed=9, layout=layout)

    threads = [threading.Thread(target=worker, args=(t,))
               for t in ("c", "cwh")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for task in ("c", "cwh"):
        lay = results[task]["layouts"][0]
        assert sorted(lay["label"]) == [1, 2]
    # cwh also pins sizes (w, h quantized by the tokenizer)
    whs = sorted(tuple(b[2:]) for b in results["cwh"]["layouts"][0]["bbox"])
    assert len(whs) == 2


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


def test_layout_batch_dim_mismatch_rejected(server_url):
    """A layout with neither 1 nor batch_size rows is a 400 for THIS client
    — not a trace-time failure that 500s every coalesced batch-mate."""
    code, out = _post(
        server_url,
        {"task": "c", "batch_size": 1,
         "layout": {"label": [[1], [2]],
                    "bbox": [[[0.5, 0.5, 0.2, 0.2]],
                             [[0.3, 0.3, 0.1, 0.1]]]}},
    )
    assert code == 400 and "batch_size" in out["error"]
    # exactly batch_size rows is accepted
    code, out = _post(
        server_url,
        {"task": "c", "batch_size": 2,
         "layout": {"label": [[1], [2]],
                    "bbox": [[[0.5, 0.5, 0.2, 0.2]],
                             [[0.3, 0.3, 0.1, 0.1]]]}},
    )
    assert code == 200
    assert [lay["label"] for lay in out["layouts"]] == [[1], [2]]


def test_negative_relation_index_rejected(server_url):
    """dst=-1 must NOT silently alias the canvas slot after the +1 shift."""
    layout = {"label": [1, 2]}
    for field, val in (("dst", -1), ("src", -1), ("dst", True)):
        rel = {"src": 0, "dst": 1, "loc": "left"}
        rel[field] = val
        code, out = _post(
            server_url,
            {"task": "relation", "layout": layout, "relations": [rel]},
        )
        assert code == 400 and "out of range" in out["error"], (field, val)


def test_queue_bound_returns_503(service):
    """When the coalescer queue is full the client gets an overload error,
    not an unbounded queue."""
    from layoutdm_tpu.serve_cli import ServiceOverloaded

    orig = service.max_queued_requests
    service.max_queued_requests = 0
    try:
        with pytest.raises(ServiceOverloaded):
            service.generate("unconditional", 1, seed=1, layout=None)
    finally:
        service.max_queued_requests = orig


def test_timed_out_request_is_withdrawn(service):
    """A request whose client timed out is removed from the queue — the
    worker must not later burn a program run on it."""
    orig = service.request_timeout_s
    service.request_timeout_s = 0.001  # << the 100 ms coalesce linger
    try:
        with pytest.raises(RuntimeError, match="timed out"):
            service.generate("unconditional", 1, seed=2, layout=None)
        with service._cv:
            assert not service._queue  # withdrawn, not abandoned in place
    finally:
        service.request_timeout_s = orig
    # service still healthy afterwards
    out = service.generate("unconditional", 1, seed=3, layout=None)
    assert len(out["layouts"]) == 1


@pytest.fixture(scope="module")
def baseline_service(tmp_path_factory):
    """A MaskGIT job behind the same service: whole-batch keys (the zoo
    samplers split ONE key internally), so no cross-request coalescing."""
    from layoutdm_tpu.configs import build_train_config
    from layoutdm_tpu.serve_cli import LayoutService
    from layoutdm_tpu.train.loop import train

    job_dir = str(tmp_path_factory.mktemp("serve_mg") / "job")
    cfg = build_train_config(
        "maskgit", "synthetic", [f"job_dir={job_dir}", "debug=true", "seed=0"]
    )
    cfg.dataset.max_seq_length = 4
    cfg.backbone.d_model = 64
    cfg.backbone.nhead = 2
    cfg.backbone.dim_feedforward = 64
    cfg.backbone.num_layers = 1
    cfg.model.num_timesteps = 4
    cfg.backbone.diffusion_step = 4
    train(cfg)

    svc = LayoutService(job_dir, max_batch_size=4, timestep_ladder=(2,))
    yield svc
    svc.close()


def test_baseline_model_serves(baseline_service):
    """The zoo lane: service starts (warmup included), requests are
    deterministic per seed, and relation is rejected up front rather than
    silently unguided."""
    svc = baseline_service
    assert svc.info()["coalescing"] is False
    a = svc.generate("unconditional", 2, seed=41, layout=None)
    b = svc.generate("unconditional", 2, seed=41, layout=None)
    assert a["layouts"] == b["layouts"]
    c = svc.generate("c", 1, seed=1,
                     layout={"label": [1], "bbox": [[0.5, 0.5, 0.2, 0.2]]})
    assert c["layouts"][0]["label"] == [1]
    with pytest.raises(ValueError, match="guidance"):
        svc.generate("relation", 1, seed=1, layout={"label": [1, 2]},
                     relations=[{"src": 0, "dst": 1, "loc": "left"}])
