"""Serving capacity bench: drive a running `serve_cli` over HTTP.

Measures, per timestep-ladder rung:
  * sequential 64-wide requests  -> bulk layouts/s (the throughput bound)
  * N concurrent batch-1 clients -> requests/s + latency percentiles.
    With request coalescing (serve_cli default) concurrent batch-1
    requests merge into shared program runs, so req/s here approaches
    (1/chain_time) x batch_width instead of 1/chain_time.

Usage:
    python -m layoutdm_tpu.serve_cli job_dir=<dir> port=8705 \
        timestep_ladder=25,100 &
    python bin/bench_serve.py http://127.0.0.1:8705 [--out FILE]

Prints one JSON line per scenario plus a final JSON array, and writes the
whole run (server info + all scenario rows) to a versioned artifact
(default `benchmarks/serve_latency.json`, committed so serving latency is
tracked round-over-round — round-4 VERDICT next #7).
"""

import json
import os
import sys
import threading
import time
import urllib.request


def post(url, payload, retries=2):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    for attempt in range(retries + 1):
        try:
            with urllib.request.urlopen(req, timeout=600) as r:
                return json.loads(r.read())
        except (ConnectionResetError, ConnectionRefusedError):
            if attempt == retries:
                raise
            time.sleep(0.1 * (attempt + 1))


def healthz(url):
    with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
        return json.loads(r.read())


def run(url, t_eval, n_req, n_threads, batch_size):
    payload = {"task": "unconditional", "batch_size": batch_size}
    if t_eval:
        payload["num_timesteps"] = t_eval
    post(url, dict(payload, seed=0))  # warm the lane
    runs0 = healthz(url)["program_runs"]
    lat = []
    lock = threading.Lock()

    def worker(k):
        for i in range(n_req // n_threads):
            t0 = time.perf_counter()
            post(url, dict(payload, seed=1000 + k * 1000 + i))
            with lock:
                lat.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker, args=(k,)) for k in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    lat.sort()
    return {
        "t_eval": t_eval, "threads": n_threads, "batch_size": batch_size,
        "requests": len(lat),
        "req_per_s": round(len(lat) / wall, 2),
        "layouts_per_s": round(batch_size * len(lat) / wall, 1),
        "p50_ms": round(1e3 * lat[len(lat) // 2], 1),
        "p95_ms": round(1e3 * lat[int(len(lat) * 0.95)], 1),
        "program_runs": healthz(url)["program_runs"] - runs0,
    }


def main():
    args = [a for a in sys.argv[1:]]
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "serve_latency.json",
    )
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    url = args[0] if args else "http://127.0.0.1:8705"
    info = healthz(url)
    print(json.dumps(info))
    rungs = (info.get("timestep_ladder") or []) + [None]  # None = trained T
    out = []
    for t_eval in rungs:
        # bulk: sequential full-width requests
        r = run(url, t_eval, n_req=10, n_threads=1,
                batch_size=info["max_batch_size"])
        print(json.dumps(r))
        out.append(r)
        # interactive: concurrent batch-1 clients (coalescing regime)
        for threads in (1, 16):
            r = run(url, t_eval, n_req=max(threads * 4, 16),
                    n_threads=threads, batch_size=1)
            print(json.dumps(r))
            out.append(r)
    print(json.dumps(out))
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(
            {
                "captured_unix": int(time.time()),
                "server": {
                    k: info.get(k)
                    for k in (
                        "timestep_ladder", "max_batch_size", "tasks",
                        "model", "dataset",
                    )
                },
                "scenarios": out,
            },
            f,
            indent=1,
        )
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
