"""Browser-based progressive viewer.

The reference presents each accumulated frame through a Vulkan
swapchain window every frame (src/RendererCore.cpp:373-412, presented
from the render loop in src/RendererPT.cpp:550-567) with GLFW key
input (src/Main.cpp:57-93).  On a headless TPU host there is no
swapchain; the TPU-native analog is an HTTP viewer: a stdlib
ThreadingHTTPServer serves the latest accumulated frame as PNG to a
browser tab that polls it at display rate, and feeds key events back
into the camera (WASD/QE translate, IJKL/UO rotate — the reference's
bindings; motion resets accumulation exactly like the terminal viewer
in cli/main.py::cmd_view).

Zero dependencies beyond the stdlib: frames ride the repo's own pure-
numpy PNG encoder (film/png.py).  The render loop runs on the main
thread (JAX dispatch stays single-threaded); the server thread only
reads the last encoded frame under a lock.
"""

from __future__ import annotations

import collections
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from logipathtracer_tpu.utils.log import get_logger

log = get_logger("webview")

_MOVE = 0.05
_TURN = 0.02
KEYMAP_T = {"w": (2, -_MOVE), "s": (2, _MOVE), "a": (0, -_MOVE),
            "d": (0, _MOVE), "q": (1, _MOVE), "e": (1, -_MOVE)}
KEYMAP_R = {"i": (0, _TURN), "k": (0, -_TURN), "j": (1, _TURN),
            "l": (1, -_TURN), "u": (2, _TURN), "o": (2, -_TURN)}

_PAGE = """<!doctype html>
<html><head><title>logipathtracer-tpu</title><style>
body { background: #111; color: #ccc; font: 13px monospace;
       display: flex; flex-direction: column; align-items: center; }
img { image-rendering: pixelated; margin-top: 12px;
      max-width: 95vw; max-height: 85vh; }
#stats { margin: 8px; }
</style></head><body>
<img id="frame" src="/frame.png" alt="render">
<div id="stats">connecting...</div>
<div>wasd/qe move &middot; ijkl/uo rotate &middot; x quit</div>
<script>
const img = document.getElementById('frame');
const stats = document.getElementById('stats');
let gen = 0;
async function tick() {
  try {
    const r = await fetch('/stats');
    const s = await r.json();
    stats.textContent = `spp ${s.spp}  ${s.samples_per_sec.toFixed(2)}` +
      ` samples/s  ${s.mrays_per_sec.toFixed(2)} Mrays/s` +
      (s.compiling ? '  [compiling scene...]' : '');
    if (s.frame_gen !== gen) {
      gen = s.frame_gen;
      img.src = '/frame.png?g=' + gen;
    }
    if (s.done) return;
  } catch (e) { stats.textContent = 'disconnected'; return; }
  setTimeout(tick, 250);
}
tick();
document.addEventListener('keydown', (ev) => {
  const k = ev.key.toLowerCase();
  if ('wasdqeijkluox'.includes(k) && k.length === 1)
    fetch('/key', {method: 'POST', body: k});
});
</script></body></html>"""


class ViewerState:
    """Shared state between the render loop and the HTTP threads."""

    def __init__(self):
        self.lock = threading.Lock()
        self.frame_png = b""
        self.frame_gen = 0
        self.stats = {"spp": 0, "samples_per_sec": 0.0,
                      "mrays_per_sec": 0.0, "compiling": True,
                      "frame_gen": 0, "done": False}
        self.keys = collections.deque()
        self.quit = threading.Event()

    def publish(self, png: bytes, stats: dict):
        with self.lock:
            if png:  # compile-phase publishes carry no frame — don't
                self.frame_png = png   # make clients refetch nothing
                self.frame_gen += 1
            self.stats = dict(stats, frame_gen=self.frame_gen,
                              done=self.quit.is_set())

    def snapshot(self):
        with self.lock:
            return self.frame_png, dict(self.stats,
                                        done=self.quit.is_set())


def _make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet: one line per poll
            pass

        def _send(self, code: int, ctype: str, body: bytes):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-store")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.split("?", 1)[0]
            png, stats = state.snapshot()
            if path == "/":
                self._send(200, "text/html", _PAGE.encode())
            elif path == "/frame.png":
                if not png:
                    self._send(503, "text/plain", b"no frame yet")
                else:
                    self._send(200, "image/png", png)
            elif path == "/stats":
                self._send(200, "application/json",
                           json.dumps(stats).encode())
            else:
                self._send(404, "text/plain", b"not found")

        def do_POST(self):
            if self.path.split("?", 1)[0] != "/key":
                self._send(404, "text/plain", b"not found")
                return
            n = int(self.headers.get("Content-Length", 0) or 0)
            key = self.rfile.read(n).decode(errors="replace").strip()[:1]
            if key == "x":
                state.quit.set()
            elif key in KEYMAP_T or key in KEYMAP_R:
                state.keys.append(key)
            self._send(200, "text/plain", b"ok")

    return Handler


def _apply_keys(state: ViewerState, renderer) -> int:
    """Drain queued keys into camera motion; returns how many applied."""
    applied = 0
    while state.keys:
        try:
            key = state.keys.popleft()
        except IndexError:  # racing producer — deque is thread-safe
            break
        if key in KEYMAP_T:
            renderer.translate(*KEYMAP_T[key])
        elif key in KEYMAP_R:
            renderer.rotate(*KEYMAP_R[key])
        applied += 1
    return applied


def serve(args, build) -> int:
    """Run the web viewer: ``build(args)`` -> (cfg, scene, renderer)
    is invoked on a background thread (async scene load, reference
    parity with src/Main.cpp:45 / RendererPT.cpp:608-612) while the
    server answers immediately; the render loop then steps one sample
    per frame, applying queued key events between steps.

    ``--frames N`` renders N progressive frames then exits (smoke/test
    mode; 0 = serve until 'x' or Ctrl-C)."""
    from logipathtracer_tpu.film.image import to_uint8
    from logipathtracer_tpu.film.png import encode_png

    state = ViewerState()
    server = ThreadingHTTPServer((args.host, args.port),
                                 _make_handler(state))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    log.info("viewer at http://%s:%d/ (x or Ctrl-C quits)",
             args.host, port)
    if getattr(args, "port_file", None):
        with open(args.port_file, "w") as fh:
            fh.write(str(port))

    box = {}

    def _load():
        try:
            box["built"] = build(args)
        except Exception as exc:
            box["error"] = exc

    loader = threading.Thread(target=_load, daemon=True)
    loader.start()

    try:
        t0 = time.perf_counter()
        while "built" not in box:
            if "error" in box:
                raise box["error"]
            if state.quit.is_set():
                return 0
            state.publish(b"", {"spp": 0, "samples_per_sec": 0.0,
                                "mrays_per_sec": 0.0, "compiling": True,
                                "compile_s": round(
                                    time.perf_counter() - t0, 1)})
            time.sleep(0.2)
        cfg, scene, r = box["built"]
        frames = 0
        while not state.quit.is_set():
            _apply_keys(state, r)
            r.step(1)
            img = to_uint8(np.asarray(r.image()))
            state.publish(encode_png(img),
                          {"spp": r.sample_count,
                           "samples_per_sec": round(r.samples_per_sec(), 3),
                           "mrays_per_sec": round(r.mrays_per_sec(), 3),
                           "compiling": False})
            frames += 1
            if args.frames and frames >= args.frames:
                break
        state.quit.set()
        # Publish the final stats (done=True) so polling clients stop.
        png, stats = state.snapshot()
        state.publish(png, {k: v for k, v in stats.items()
                            if k not in ("frame_gen", "done")})
        if args.frames and getattr(args, "linger", 0.0):
            time.sleep(args.linger)
        return 0
    except KeyboardInterrupt:
        return 0
    finally:
        state.quit.set()
        server.shutdown()
