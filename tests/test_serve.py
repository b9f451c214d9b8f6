"""Serving runtime (scripts/serve.py): export artifact -> HTTP server ->
detections. Exercises the full deployment chain — export_model's StableHLO
artifact deserialized by the server, npz request decoding, fixed-shape
batch padding, parse_pred/NMS on the response path — over a real socket."""
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from parq_tpu.config import get_cfg

BATCH = 2  # compiled batch size; requests below send B=1 (padding path)


def _smoke_cfg():
    cfg = get_cfg()
    cfg.defrost()
    cfg.merge_from_file("configs/smoke.yaml")
    # random-init scores are arbitrary; keep the response non-vacuous
    cfg.MODEL.DECODER.CONF_THRESH = 0.0
    cfg.freeze()
    return cfg


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from scripts.export_model import export_forward
    from scripts.serve import build_server

    cfg = _smoke_cfg()
    blob, _, _ = export_forward(cfg, batch_size=BATCH)
    art = tmp_path_factory.mktemp("serve") / "parq_fwd.jaxexport"
    art.write_bytes(blob)

    srv = build_server(cfg, artifact=str(art), batch_size=BATCH)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _url(server, path):
    host, port = server.server_address
    return f"http://{host}:{port}{path}"


def _post_npz(server, arrays, expect_ok=True):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(_url(server, "/detect"), data=buf.getvalue(),
                                 method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _request_arrays(b=1, seed=0):
    from parq_tpu.data.synthetic import make_batch
    from scripts.serve import INPUT_KEYS

    cfg = _smoke_cfg()
    batch = make_batch(list(range(seed, seed + b)),
                       image_size=tuple(cfg.TPU.IMAGE_SIZE))
    return {k: np.asarray(batch[k], np.float32) for k in INPUT_KEYS}


def test_healthz_and_spec(server):
    with urllib.request.urlopen(_url(server, "/healthz")) as r:
        assert json.loads(r.read()) == {"status": "ok"}
    with urllib.request.urlopen(_url(server, "/spec")) as r:
        spec = json.loads(r.read())
    assert spec["batch_size"] == BATCH
    assert spec["inputs"]["rgb_img"]["shape"][0] == BATCH
    assert set(spec["inputs"]) == {"rgb_img", "camera", "T_camera_pseudoCam",
                                   "T_world_pseudoCam", "T_world_local"}


def test_detect_padded_batch(server):
    """B=1 request against the B=2 compiled program: padded on device,
    padding dropped from the response; box structure well-formed."""
    status, resp = _post_npz(server, _request_arrays(b=1))
    assert status == 200
    dets = resp["detections"]
    assert len(dets) == 1          # padding never leaks into the response
    assert len(dets[0]) > 0        # CONF_THRESH=0 keeps NMS survivors
    box = dets[0][0]
    assert set(box) == {"label", "score", "center", "size", "corners_world"}
    assert np.asarray(box["corners_world"]).shape == (8, 3)
    assert 0.0 <= box["score"] <= 1.0
    assert len(box["center"]) == 3 and len(box["size"]) == 3


def test_detect_deterministic(server):
    a = _post_npz(server, _request_arrays(b=1))[1]
    b = _post_npz(server, _request_arrays(b=1))[1]
    assert a == b


def test_detect_full_batch_uint8(server):
    """B == compiled batch, uint8 images (the /255 convenience path)."""
    arrays = _request_arrays(b=BATCH, seed=10)
    arrays["rgb_img"] = (np.clip(arrays["rgb_img"], 0, 1)
                         * 255).astype(np.uint8)
    status, resp = _post_npz(server, arrays)
    assert status == 200
    assert len(resp["detections"]) == BATCH


def test_detect_rejects_bad_shapes(server):
    arrays = _request_arrays(b=1)
    arrays["camera"] = arrays["camera"][:, :, :4]       # wrong trailing dim
    status, resp = _post_npz(server, arrays)
    assert status == 400 and "camera" in resp["error"]

    arrays = _request_arrays(b=1)
    del arrays["T_world_local"]
    status, resp = _post_npz(server, arrays)
    assert status == 400 and "missing" in resp["error"]

    status, resp = _post_npz(server, _request_arrays(b=BATCH + 1))
    assert status == 400 and "batch" in resp["error"]
