"""Layout-generation server — the production-serving surface.

The reference has no serving story (research CLIs only); this wraps the
compiled sampler in a minimal stdlib HTTP endpoint so a trained job can be
deployed as a service:

    python -m layoutdm_tpu.serve_cli job_dir=<dir> port=8700 [warm_tasks=c]
        [timestep_ladder=25,50,100]

Endpoints
---------
GET  /healthz            -> {"status": "ok", "model": ..., "dataset": ...}
POST /generate           -> JSON layouts
        {"task": "unconditional" | "c" | "cwh" | "partial" | "refinement",
         "batch_size": int,                (default 1, <= max_batch_size)
         "seed": int,                      (optional)
         "num_timesteps": int,             (optional quality/latency knob:
                                            must be in the service's
                                            timestep ladder — each ladder
                                            value is one precompiled
                                            skip-step program, measured
                                            linear: T=25 is ~4x faster
                                            than T=100)
         "layout": {                       (required for conditional tasks)
            "label": [[int, ...]],         per-sample category ids
            "bbox":  [[[x,y,w,h], ...]],   normalized xywh
         }}
     -> {"layouts": [{"label": [...], "bbox": [[x,y,w,h], ...]}, ...],
         "ms_per_sample": float}

Design: requests are padded to a fixed batch size so every call reuses the
ONE compiled T-step sampler (first compile happens at startup via a warmup
request, not on a client's clock). Single-threaded on purpose — the TPU is
serial anyway; queuing happens in the HTTP listen backlog.
"""

from __future__ import annotations

import json
import logging
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from typing import Dict, Optional

import jax
import numpy as np

from layoutdm_tpu.configs import SamplingConfig
from layoutdm_tpu.tasks import get_cond, to_sampler_cond

logger = logging.getLogger(__name__)

COND_TASKS = ("c", "cwh", "partial", "refinement")


class LayoutService:
    """Owns the model, params, and the compiled samplers."""

    def __init__(
        self,
        job_dir: str,
        max_batch_size: int = 64,
        sampling: Optional[SamplingConfig] = None,
        warm_tasks=("unconditional",),
        timestep_ladder=(),
    ):
        from layoutdm_tpu.factory import build_model, build_tokenizer
        from layoutdm_tpu.train import checkpoint as ckpt

        self.train_cfg = ckpt.load_config(job_dir)
        self.train_cfg.data.pad_until_max = True
        self.tokenizer = build_tokenizer(self.train_cfg)
        self.model = build_model(self.train_cfg, self.tokenizer)
        template = self.model.init(jax.random.PRNGKey(0))
        self.params = ckpt.load_params(template, job_dir, "best")
        self.sampling = sampling or SamplingConfig(name="random")
        self.B = int(max_batch_size)
        # allowed per-request num_timesteps values (a bounded set: each is
        # one compiled program — an open set would let clients compile-bomb
        # the service)
        self.ladder = tuple(sorted({int(t) for t in timestep_ladder}))
        T_train = self.model.q.num_timesteps
        for t in self.ladder:
            if not (0 < t <= T_train):
                raise ValueError(
                    f"timestep_ladder rung {t} out of range: must satisfy "
                    f"0 < t <= num_timesteps ({T_train}) of the trained model"
                )
        self._counter = 0
        # ONE compiled program per (t_eval, cond-mode) covering
        # PRNGKey + reverse chain + tokenizer.decode.  Composing these
        # eagerly costs a dispatch per jnp op — on a remote-TPU path with a
        # ~30 ms invocation floor (docs/DESIGN.md §5) that was ~1 s of
        # fixed per-request latency before the chain even ran.
        self._run_cache: Dict = {}
        self._empty_cond = None

        # conditional tasks need a layout — warm them with a trivial one
        dummy_layout = {"label": [0], "bbox": [[0.5, 0.5, 0.2, 0.2]]}
        for task in warm_tasks:
            lay = None if task == "unconditional" else dummy_layout
            logger.info("warmup compile: %s", task)
            self.generate(task, min(4, self.B), seed=0, layout=lay)
            for t in self.ladder:
                logger.info("warmup compile: %s T=%d", task, t)
                self.generate(
                    task, min(4, self.B), seed=0, layout=lay,
                    num_timesteps=t,
                )
        logger.info("service ready (batch=%d)", self.B)

    # -- request handling ----------------------------------------------------
    def _build_cond(self, task: str, layout: Optional[Dict], B: int):
        if task == "unconditional":
            return None
        if layout is None:
            raise ValueError(f"task '{task}' requires a 'layout'")
        label = np.asarray(layout["label"], np.int32)
        bbox = np.asarray(layout["bbox"], np.float32)
        if label.ndim == 1:
            label, bbox = label[None], bbox[None]
        n, S = label.shape[1], self.tokenizer.max_elements
        if n > S:
            raise ValueError(f"too many elements: {n} > {S}")
        pad = S - n
        batch = {
            "label": np.pad(label, ((0, 0), (0, pad))),
            "bbox": np.pad(bbox, ((0, 0), (0, pad), (0, 0))),
            "mask": np.pad(
                np.ones_like(label, bool), ((0, 0), (0, pad))
            ),
        }
        # broadcast one condition to the whole padded batch (demo-notebook
        # semantics, `task.py:235-248`)
        if label.shape[0] == 1:
            batch = {k: np.repeat(v, B, axis=0) for k, v in batch.items()}
        cond = get_cond(
            jax.random.PRNGKey(0), batch, self.tokenizer, task
        )
        return to_sampler_cond(cond, self.tokenizer, self.sampling)

    def generate(
        self, task: str, batch_size: int, seed: Optional[int], layout,
        num_timesteps: Optional[int] = None,
    ) -> Dict:
        if task != "unconditional" and task not in COND_TASKS:
            raise ValueError(
                f"unknown task '{task}' (one of unconditional/{'/'.join(COND_TASKS)})"
            )
        if num_timesteps is not None:
            if (
                not float(num_timesteps).is_integer()
                or int(num_timesteps) not in self.ladder
            ):
                raise ValueError(
                    f"num_timesteps {num_timesteps} not in the service ladder "
                    f"{list(self.ladder)} (start with timestep_ladder=...)"
                )
        B = min(int(batch_size), self.B)
        if B < 1:
            raise ValueError("batch_size must be >= 1")
        if seed is None:
            self._counter += 1
            seed = self._counter

        # pad to the service batch so the compiled program is reused
        cond = self._build_cond(task, layout, self.B)
        if cond is None:
            from layoutdm_tpu.models.diffusion.sampler import SamplerCond

            if self._empty_cond is None:
                self._empty_cond = SamplerCond.empty(
                    self.B, self.model.seq_len, self.model.num_classes
                )
            cond = self._empty_cond
        t_eval = int(num_timesteps) if num_timesteps is not None else None

        fn = self._run_cache.get(t_eval)
        if fn is None:
            import jax.numpy as jnp

            def run(params, seed, cond):
                r = jax.random.PRNGKey(seed)
                ids = self.model.sample_ids(
                    params, r, self.B, cond=cond, sampling=self.sampling,
                    num_timesteps_eval=t_eval,
                )
                return self.tokenizer.decode(ids)

            fn = jax.jit(run)
            self._run_cache[t_eval] = fn

        t0 = time.perf_counter()
        # fold arbitrary python ints into int32 range (np.int32(2**31)
        # raises OverflowError on NumPy 2, and PRNGKey wants int32)
        seed32 = np.int32(int(seed) & 0x7FFFFFFF)
        out = jax.device_get(fn(self.params, seed32, cond))
        bbox = out["bbox"][:B]
        label = out["label"][:B]
        mask = out["mask"][:B]
        dt = time.perf_counter() - t0

        layouts = []
        for i in range(B):
            m = mask[i]
            layouts.append(
                {
                    "label": label[i][m].tolist(),
                    "bbox": np.round(bbox[i][m], 4).tolist(),
                }
            )
        return {
            "layouts": layouts,
            "ms_per_sample": round(dt * 1e3 / self.B, 2),
            # the seed actually consumed: int(seed) & 0x7FFFFFFF aliases
            # client seeds differing only in sign/high bits, so determinism
            # claims must reference THIS value, not the request's
            "seed": int(seed32),
        }

    def info(self) -> Dict:
        return {
            "status": "ok",
            "model": self.train_cfg.model.name,
            "dataset": self.train_cfg.dataset.name,
            "max_elements": self.tokenizer.max_elements,
            "max_batch_size": self.B,
            "timestep_ladder": list(self.ladder),
        }


def make_handler(service: LayoutService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: Dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, service.info())
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                out = service.generate(
                    req.get("task", "unconditional"),
                    req.get("batch_size", 1),
                    req.get("seed"),
                    req.get("layout"),
                    req.get("num_timesteps"),
                )
                self._send(200, out)
            except (ValueError, KeyError, TypeError) as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover
                logger.exception("generate failed")
                self._send(500, {"error": str(e)})

        def log_message(self, fmt, *args):
            logger.info("%s - %s", self.address_string(), fmt % args)

    return Handler


def main(argv=None):
    import argparse

    from layoutdm_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(
        description="serve: layoutdm_tpu.serve_cli job_dir=<dir> [k=v ...]"
    )
    p.add_argument("overrides", nargs="*")
    a = p.parse_args(argv)
    kv = dict(o.split("=", 1) for o in a.overrides)
    job_dir = kv.get("job_dir")
    assert job_dir, "job_dir=<trained job> is required"
    port = int(kv.get("port", 8700))
    ladder = tuple(
        int(t) for t in kv.get("timestep_ladder", "").split(",") if t
    )
    service = LayoutService(
        job_dir,
        max_batch_size=int(kv.get("max_batch_size", 64)),
        warm_tasks=tuple(kv.get("warm_tasks", "unconditional").split(",")),
        timestep_ladder=ladder,
    )
    server = HTTPServer((kv.get("host", "127.0.0.1"), port), make_handler(service))
    logger.info("listening on :%d", port)
    server.serve_forever()


if __name__ == "__main__":
    main()
