"""Host viewer (reference twin: the bevy_winit window + event loop,
`crates/bevy_winit/src/lib.rs` — re-imagined for a headless TPU host:
instead of an OS window, an HTTP server streams the framebuffer as
MJPEG to any browser and feeds browser keyboard/mouse events back into
the engine's frame-input channels, so `app.input` behaves exactly as if
a winit window were attached).

Usage:
    app.add_plugins(..., InputPlugin(), ViewerPlugin(port=8600))
    while True: app.update(dt=...)   # open http://localhost:8600

Design notes (TPU-first): the render stays fully on-device; the viewer
thread JPEG-encodes the *latest readback* at its own pace (a slow
browser can never stall the frame loop — frames are dropped, not
queued). No new dependencies: http.server + PIL.
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from bevy_tpu.app.plugin import Plugin

_PAGE = """<!doctype html>
<html><head><title>bevy_tpu viewer</title><style>
body { margin:0; background:#111; display:flex; flex-direction:column;
       align-items:center; font-family:monospace; color:#9a9; }
img  { image-rendering:pixelated; outline:none; margin-top:8px; }
</style></head><body>
<div>bevy_tpu — click the frame to capture keyboard</div>
<img id="s" src="/stream" tabindex="0">
<script>
const img = document.getElementById('s');
function post(o) { fetch('/input', {method:'POST', body:JSON.stringify(o)}); }
img.addEventListener('keydown', e => { post({key:e.code, down:true});
                                       e.preventDefault(); });
img.addEventListener('keyup',   e => { post({key:e.code, down:false});
                                       e.preventDefault(); });
img.addEventListener('mousemove', e => {
  const r = img.getBoundingClientRect();
  post({mouse:[e.clientX-r.left, e.clientY-r.top]}); });
img.addEventListener('mousedown', e => { img.focus();
  post({button:e.button, down:true}); e.preventDefault(); });
img.addEventListener('mouseup',   e => {
  post({button:e.button, down:false}); e.preventDefault(); });
img.addEventListener('wheel', e => {
  post({scroll:[e.deltaX, e.deltaY]}); e.preventDefault(); });
img.addEventListener('contextmenu', e => e.preventDefault());
</script></body></html>"""


class _State:
    def __init__(self):
        self.jpeg = None          # latest encoded frame
        self.seq = 0
        self.cond = threading.Condition()
        self.app = None           # for app.input lookup (plugin-order safe)

    @property
    def input_state(self):
        return getattr(self.app, "input", None)


def _make_handler(st: _State, fps_cap: float):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):      # quiet
            pass

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/frame.jpg":
                buf = st.jpeg
                if buf is None:
                    self.send_response(503)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/jpeg")
                self.send_header("Content-Length", str(len(buf)))
                self.end_headers()
                self.wfile.write(buf)
            elif self.path == "/stream":
                self.send_response(200)
                self.send_header(
                    "Content-Type",
                    "multipart/x-mixed-replace; boundary=frame")
                self.end_headers()
                last = -1
                min_dt = 1.0 / fps_cap
                try:
                    while True:
                        with st.cond:
                            st.cond.wait_for(
                                lambda: st.seq != last, timeout=1.0)
                            buf, last = st.jpeg, st.seq
                        if buf is None:
                            continue
                        self.wfile.write(
                            b"--frame\r\nContent-Type: image/jpeg\r\n"
                            b"Content-Length: " +
                            str(len(buf)).encode() + b"\r\n\r\n")
                        self.wfile.write(buf)
                        self.wfile.write(b"\r\n")
                        time.sleep(min_dt)
                except (BrokenPipeError, ConnectionResetError):
                    pass
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if self.path != "/input":
                self.send_response(404)
                self.end_headers()
                return
            n = int(self.headers.get("Content-Length", 0))
            try:
                msg = json.loads(self.rfile.read(n) or b"{}")
            except ValueError:
                msg = {}
            inp = st.input_state
            if inp is not None:
                from bevy_tpu.input import KeyCode
                if "key" in msg:
                    idx = getattr(KeyCode, msg["key"], None)
                    if idx is not None:
                        (inp.press if msg.get("down") else
                         inp.release)(idx)
                if "button" in msg:
                    b = int(msg["button"])
                    if 0 <= b < inp.mouse_buttons.shape[0]:
                        (inp.press_mouse if msg.get("down") else
                         inp.release_mouse)(b)
                if "mouse" in msg:
                    x, y = msg["mouse"]
                    inp.move_to(float(x), float(y))
                if "scroll" in msg:
                    sx, sy = msg["scroll"]
                    inp.scroll[:] = (float(sx), float(sy))
            self.send_response(204)
            self.end_headers()

    return Handler


class ViewerPlugin(Plugin):
    """Optional host viewer: MJPEG stream + browser input bridge.

    port=0 picks an ephemeral port (read it from `app.viewer.port`).
    quality: JPEG quality. fps_cap: max stream rate per client.
    `app.viewer.url` is the address to open."""

    def __init__(self, port: int = 8600, quality: int = 85,
                 fps_cap: float = 60.0):
        self.port = port
        self.quality = quality
        self.fps_cap = fps_cap

    def build(self, app):
        st = _State()
        st.app = app
        srv = ThreadingHTTPServer(("127.0.0.1", self.port),
                                  _make_handler(st, self.fps_cap))
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        self.port = srv.server_address[1]
        self.url = f"http://127.0.0.1:{self.port}/"
        self._server, self._state = srv, st
        app.viewer = self

        quality = self.quality

        def publish(app_):
            """Post-frame host hook: encode the latest frame readback
            (same present position as frame_image — ssaa resolve + sRGB).
            Always-on: ~1 ms at 720p, keeps /frame.jpg warm for tooling."""
            from PIL import Image

            from bevy_tpu.render.plugin import frame_image
            img = frame_image(app_)
            buf = io.BytesIO()
            Image.fromarray(np.asarray(img)[..., :3]).save(
                buf, "JPEG", quality=quality)
            with st.cond:
                st.jpeg = buf.getvalue()
                st.seq += 1
                st.cond.notify_all()

        app.add_frame_hook(publish)

    def shutdown(self):
        self._server.shutdown()
