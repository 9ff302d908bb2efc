"""Web viewer (cli/webview.py): HTTP routes, key -> camera plumbing,
and quit, driven against a stub renderer so no render graph compiles.
The real end-to-end surface (serve + progressive cornell frames) is a
/verify drive: `python -m logipathtracer_tpu.cli.main web <scene>
--frames N --port 0 --port-file P` then GET /frame.png."""

import json
import threading
import time
import types
import urllib.request

import numpy as np
import pytest

from logipathtracer_tpu.cli.webview import serve
from logipathtracer_tpu.film.png import decode_png


class StubRenderer:
    def __init__(self):
        self.sample_count = 0
        self.moves = []
        self.rots = []

    def step(self, n=1):
        time.sleep(0.01)
        self.sample_count += n

    def image(self):
        v = min(self.sample_count * 8, 255) / 255.0
        img = np.full((16, 16, 3), v, np.float32)
        return img

    def samples_per_sec(self):
        return float(self.sample_count)

    def mrays_per_sec(self):
        return 0.5

    def translate(self, axis, amount):
        self.moves.append((axis, amount))
        self.sample_count = 0  # motion resets accumulation

    def rotate(self, axis, angle):
        self.rots.append((axis, angle))
        self.sample_count = 0


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.read()


def _post(url, body):
    req = urllib.request.Request(url, data=body.encode(), method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.read()


@pytest.fixture
def viewer(tmp_path):
    stub = StubRenderer()
    port_file = tmp_path / "port"
    args = types.SimpleNamespace(host="127.0.0.1", port=0,
                                 port_file=str(port_file), frames=0,
                                 linger=0.0)
    rc = {}

    def build(a):
        time.sleep(0.05)  # exercise the async-load phase
        return None, None, stub

    t = threading.Thread(target=lambda: rc.setdefault(
        "rc", serve(args, build)), daemon=True)
    t.start()
    for _ in range(100):
        if port_file.exists() and port_file.read_text():
            break
        time.sleep(0.05)
    base = f"http://127.0.0.1:{port_file.read_text()}"
    yield base, stub, t, rc
    try:
        _post(base + "/key", "x")
    except OSError:
        pass  # test already quit the server
    t.join(timeout=10)


def _get_raw(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.read(), dict(r.headers)


def test_webview_raw_route(viewer):
    """/frame.raw serves the uint8 RGBA blit with size headers — the
    display path (PNG is on-demand only)."""
    base, stub, t, rc = viewer
    for _ in range(100):
        stats = json.loads(_get(base + "/stats"))
        if not stats["compiling"] and stats["spp"] > 1:
            break
        time.sleep(0.05)
    body, headers = _get_raw(base + "/frame.raw")
    w = int(headers["X-Frame-Width"])
    h = int(headers["X-Frame-Height"])
    assert (w, h) == (16, 16)
    assert len(body) == w * h * 4
    arr = np.frombuffer(body, np.uint8).reshape(h, w, 4)
    assert arr[..., 3].min() == 255
    assert arr[..., :3].max() > 0


def test_webview_preview_switch(tmp_path):
    """With a preview renderer (4-tuple build), key frames render on
    the preview and key-free frames return to the full renderer."""
    full, prev = StubRenderer(), StubRenderer()
    prev.image = lambda: np.full((8, 8, 3), 0.5, np.float32)
    port_file = tmp_path / "port"
    args = types.SimpleNamespace(host="127.0.0.1", port=0,
                                 port_file=str(port_file), frames=0,
                                 linger=0.0)
    rc = {}

    def build(a):
        return None, None, full, prev

    t = threading.Thread(target=lambda: rc.setdefault(
        "rc", serve(args, build)), daemon=True)
    t.start()
    for _ in range(100):
        if port_file.exists() and port_file.read_text():
            break
        time.sleep(0.05)
    base = f"http://127.0.0.1:{port_file.read_text()}"
    try:
        # Hold a key: frames switch to the 8x8 preview.
        saw_preview = False
        for _ in range(60):
            _post(base + "/key", "j")
            _, headers = _get_raw(base + "/frame.raw")
            if int(headers["X-Frame-Width"]) == 8:
                saw_preview = True
                stats = json.loads(_get(base + "/stats"))
                break
            time.sleep(0.03)
        assert saw_preview
        assert prev.rots and full.rots  # camera mirrored to both
        # Release: frames return to the 16x16 full renderer.
        saw_full = False
        for _ in range(60):
            _, headers = _get_raw(base + "/frame.raw")
            if int(headers["X-Frame-Width"]) == 16:
                saw_full = True
                break
            time.sleep(0.03)
        assert saw_full
    finally:
        try:
            _post(base + "/key", "x")
        except OSError:
            pass
        t.join(timeout=10)


def test_webview_routes_and_keys(viewer):
    base, stub, t, rc = viewer
    page = _get(base + "/").decode()
    assert "frame.png" in page and "keydown" in page

    # Wait until the render loop has produced frames.
    for _ in range(100):
        stats = json.loads(_get(base + "/stats"))
        if not stats["compiling"] and stats["spp"] > 2:
            break
        time.sleep(0.05)
    assert not stats["compiling"] and stats["spp"] > 2
    assert stats["mrays_per_sec"] == 0.5

    img = decode_png(_get(base + "/frame.png"))
    assert img.shape[:2] == (16, 16)
    assert img[..., :3].max() > 0

    # Keys: translate + rotate reach the renderer and reset spp.
    _post(base + "/key", "w")
    _post(base + "/key", "j")
    for _ in range(100):
        if stub.moves and stub.rots:
            break
        time.sleep(0.05)
    assert stub.moves == [(2, -0.05)]
    assert stub.rots == [(1, 0.02)]

    # Unknown routes 404; junk keys are ignored.
    with pytest.raises(Exception):
        _get(base + "/nope")
    _post(base + "/key", "z")

    # 'x' quits: serve() returns 0 and the loop stops.
    _post(base + "/key", "x")
    t.join(timeout=10)
    assert not t.is_alive()
    assert rc["rc"] == 0
