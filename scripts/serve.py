#!/usr/bin/env python
"""HTTP serving runtime for the exported PARQ forward.

The deployment path the reference (torch-only, no serving story) lacks:
load a `jax.export` StableHLO artifact produced by
``scripts/export_model.py`` — or fall back to jitting the live model —
pair it with a checkpoint, and serve 3D detections over HTTP. The device
compute is the exact eval forward; the host side is the same
``parse_pred`` → NMS chain eval.py uses (ref protocol: eval.py:18-67).

    python scripts/serve.py --cfg configs/eval.yaml \
        [--artifact parq_fwd.jaxexport] [--CHECKPOINT_PATH ckpt] \
        [--port 8000] [--batch 1]

Protocol (input shapes are FIXED by the compiled program — GET /spec):

  GET  /healthz  -> {"status": "ok"}
  GET  /spec     -> expected request arrays: name -> {shape, dtype}
  POST /detect   -> body: an .npz with rgb_img (B,T,H,W,3; float in [0,1]
                    or uint8), camera (B,T,6), T_camera_pseudoCam (B,T,12),
                    T_world_pseudoCam (B,T,12), T_world_local (B,1,12).
                    B may be <= the served batch size (requests are padded
                    to the compiled shape; padding is dropped from the
                    response). Response: {"detections": [[{label, score,
                    center, size, corners_world}, ...] per sample]}.

Single-flight: requests serialize around the device call (one compiled
program, one device stream); the HTTP layer is threaded so health checks
never block behind an inference.
"""
import argparse
import io
import json
import logging
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INPUT_KEYS = ("rgb_img", "camera", "T_camera_pseudoCam",
              "T_world_pseudoCam", "T_world_local")


class Engine:
    """Owns the compiled forward + params; turns request arrays into boxes."""

    def __init__(self, cfg, artifact_path=None, checkpoint=None,
                 batch_size=1):
        import jax
        from parq_tpu.data.synthetic import device_batch, make_batch
        from parq_tpu.models import PARQModel

        self.cfg = cfg
        self.batch_size = batch_size
        self._lock = threading.Lock()

        model = PARQModel.from_config(cfg)
        example = device_batch(make_batch(
            list(range(batch_size)), image_size=tuple(cfg.TPU.IMAGE_SIZE)))
        example = {k: example[k] for k in INPUT_KEYS}
        self.spec = {k: {"shape": list(v.shape), "dtype": "float32"}
                     for k, v in example.items()}

        variables = model.init(jax.random.PRNGKey(0), example)
        if checkpoint:
            import optax
            from parq_tpu.train import load_pretrained
            from parq_tpu.train.train_step import TrainState
            state = TrainState(step=0, params=variables["params"],
                               frozen=variables.get("frozen", {}),
                               opt_state=None, tx=optax.identity(),
                               apply_fn=model.apply)
            state = load_pretrained(
                state, checkpoint,
                num_heads=cfg.MODEL.DECODER.TRANSFORMER.DEC_HEADS,
                share_weights=cfg.MODEL.DECODER.TRANSFORMER.SHARE_WEIGHTS,
                strict=True)
            variables = {"params": state.params, "frozen": state.frozen}
        self._variables = variables

        if artifact_path:
            from jax import export as jexport
            with open(artifact_path, "rb") as f:
                self._call = jexport.deserialize(f.read()).call
        else:
            self._call = jax.jit(lambda v, b: model.apply(
                v, b, deterministic=True))

        logging.info("warmup forward (compile)...")
        jax.block_until_ready(self._call(self._variables, example))
        logging.info("engine ready: batch=%d image=%s",
                     batch_size, tuple(cfg.TPU.IMAGE_SIZE))

    # ------------------------------------------------------------- I/O --
    def _validate(self, arrays):
        missing = [k for k in INPUT_KEYS if k not in arrays]
        if missing:
            raise ValueError(f"missing arrays: {missing}")
        b = arrays["rgb_img"].shape[0] if arrays["rgb_img"].ndim else 0
        if not 1 <= b <= self.batch_size:
            raise ValueError(
                f"request batch {b} not in [1, {self.batch_size}] "
                "(fixed compiled shape; see GET /spec)")
        out = {}
        for k in INPUT_KEYS:
            a = np.asarray(arrays[k])
            if k == "rgb_img" and a.dtype == np.uint8:
                a = a.astype(np.float32) / 255.0
            a = a.astype(np.float32)
            want = tuple(self.spec[k]["shape"])
            if a.shape[0] != b or a.shape[1:] != want[1:]:
                raise ValueError(
                    f"{k}: got shape {tuple(a.shape)}, want ({b},) + "
                    f"{want[1:]}")
            if b < self.batch_size:   # pad to the compiled batch size
                a = np.concatenate(
                    [a, np.repeat(a[-1:], self.batch_size - b, axis=0)])
            out[k] = a
        return out, b

    def detect(self, arrays):
        """npz dict -> per-sample detection lists (JSON-ready)."""
        from parq_tpu.evals.parse_pred import parse_pred

        batch, b = self._validate(arrays)
        dec = self.cfg.MODEL.DECODER
        with self._lock:
            outputs = self._call(self._variables, batch)
        last = {k: v[-1] for k, v in outputs.items()}
        host = parse_pred(last, batch["T_world_local"],
                          tuple(dec.TRACK_SCALE), dec.NUM_SEMCLS,
                          enable_nms=bool(dec.ENABLE_NMS))
        center = np.asarray(last["center_unnormalized"])
        size = np.asarray(last["size_unnormalized"])
        dets = []
        for i in range(b):
            keep = np.where(host["pred_mask"][i]
                            & (host["scores"][i] >= dec.CONF_THRESH))[0]
            dets.append([{
                "label": int(host["labels"][i, k]),
                "score": float(host["scores"][i, k]),
                "center": center[i, k].tolist(),
                "size": size[i, k].tolist(),
                "corners_world": host["corners_world"][i, k].tolist(),
            } for k in keep])
        return dets


class Handler(BaseHTTPRequestHandler):
    def _send(self, code, payload):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        if self.path == "/healthz":
            self._send(200, {"status": "ok"})
        elif self.path == "/spec":
            self._send(200, {"batch_size": self.server.engine.batch_size,
                             "inputs": self.server.engine.spec})
        else:
            self._send(404, {"error": f"unknown path {self.path}"})

    def do_POST(self):
        if self.path != "/detect":
            self._send(404, {"error": f"unknown path {self.path}"})
            return
        try:
            n = int(self.headers.get("Content-Length", "0"))
            try:
                arrays = dict(np.load(io.BytesIO(self.rfile.read(n)),
                                      allow_pickle=False))
            except Exception as e:  # malformed npz — the client's fault
                raise ValueError(f"bad npz body: {type(e).__name__}: {e}")
            dets = self.server.engine.detect(arrays)
        except ValueError as e:      # client error (shape/key/body)
            self._send(400, {"error": str(e)})
        except Exception as e:       # server-side failure (device, ckpt, …)
            logging.exception("inference failed")
            self._send(500, {"error": f"{type(e).__name__}: {e}"})
        else:
            self._send(200, {"detections": dets})

    def log_message(self, fmt, *args):  # route through logging, not stderr
        logging.info("%s %s", self.address_string(), fmt % args)


def build_server(cfg, artifact=None, checkpoint=None, batch_size=1,
                 host="127.0.0.1", port=0):
    """Construct the engine + bound server (port 0 = ephemeral)."""
    server = ThreadingHTTPServer((host, port), Handler)
    server.engine = Engine(cfg, artifact, checkpoint, batch_size)
    return server


def main():
    ap = argparse.ArgumentParser(description="PARQ-TPU serving runtime")
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--artifact", default=None,
                    help=".jaxexport from scripts/export_model.py "
                         "(default: jit the live model)")
    ap.add_argument("--CHECKPOINT_PATH", type=str, default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)
    from parq_tpu.config import apply_platform, get_cfg, update_config
    cfg = get_cfg()
    update_config(cfg, args)
    if args.CHECKPOINT_PATH:  # flag shadows the cfg key, like eval.py
        cfg.defrost(); cfg.CHECKPOINT_PATH = args.CHECKPOINT_PATH
        cfg.freeze()
    apply_platform(cfg)

    ckpt = cfg.CHECKPOINT_PATH or None
    if not ckpt:
        logging.warning("no CHECKPOINT_PATH (flag or config) — serving "
                        "RANDOM-INIT weights; detections will be garbage")
    server = build_server(cfg, args.artifact, ckpt,
                          args.batch, args.host, args.port)
    print(f"serving on http://{server.server_address[0]}:"
          f"{server.server_address[1]}  (POST /detect, GET /spec /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
