"""Lightweight progressive viewer for headless TPU rendering.

The reference is an interactive GLFW/ImGui app (L4, e.g.
path_tracing_main.cpp:663-857); a TPU pod has no display, so the viewer the
framework ships is a streaming one (SURVEY.md §7 hard part #6 "offline
frames + lightweight streaming viewer"): the render loop pushes progressive
accumulation snapshots and a tiny built-in HTTP server serves an
auto-refreshing page — open http://<host>:<port> in any browser (port
forwardable over SSH). No dependencies beyond the standard library.
"""

from __future__ import annotations

import io
import threading


class LiveViewer:
    """Serves the latest pushed image at / (HTML wrapper) and /frame.png.

    Usage:
        viewer = LiveViewer(port=8716)   # prints the URL
        for f in range(frames):
            ...
            viewer.update(np.asarray(film.beauty), frame=f)
    """

    def __init__(self, port: int = 8716, refresh_ms: int = 500,
                 title: str = "gfxexp_tpu"):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        self._png = b""
        self._frame = 0
        self._lock = threading.Lock()
        viewer = self

        page = f"""<!doctype html><html><head><title>{title}</title>
<style>body{{background:#111;color:#ccc;font-family:monospace;
text-align:center}}img{{image-rendering:pixelated;max-width:95vw;
max-height:85vh}}</style></head><body>
<h3>{title} — frame <span id=f>0</span></h3>
<img id=im src=/frame.png>
<script>setInterval(()=>{{const i=document.getElementById('im');
i.src='/frame.png?'+Date.now();
fetch('/meta').then(r=>r.text()).then(t=>
  document.getElementById('f').textContent=t);}},{refresh_ms});
</script></body></html>"""

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):
                if self.path.startswith("/frame.png"):
                    with viewer._lock:
                        data = viewer._png
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Cache-Control", "no-store")
                    self.end_headers()
                    self.wfile.write(data)
                elif self.path.startswith("/meta"):
                    self.send_response(200)
                    self.end_headers()
                    self.wfile.write(str(viewer._frame).encode())
                else:
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.end_headers()
                    self.wfile.write(page.encode())

            def log_message(self, *a):  # quiet
                pass

        self._server = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        self.port = self._server.server_address[1]
        t = threading.Thread(target=self._server.serve_forever, daemon=True)
        t.start()
        print(f"live viewer: http://localhost:{self.port}/", flush=True)

    def update(self, image, frame: int = 0, brightness: float = 1.0):
        """image: [H, W, 3] linear float. Tonemapped (x/(1+x)) + sRGB."""
        import numpy as np

        from gfxexp_tpu.utils.image_io import encode_png

        img = np.asarray(image, np.float32) * brightness
        img = img / (1.0 + img)
        data = encode_png(img, apply_srgb=True)
        with self._lock:
            self._png = data
            self._frame = int(frame)

    def close(self):
        self._server.shutdown()
