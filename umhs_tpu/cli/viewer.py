"""`umhs-viewer` — a minimal interactive viewer (the ns-viewer surface).

The reference relies on nerfstudio's websocket viewer (`vis="viewer"`,
scripts/visualize/*.sh). This is a dependency-free equivalent: a tiny HTTP
server + HTML orbit UI. The browser requests frames with orbit camera
parameters; each request renders through the trained model on the TPU and
returns a PNG. Output layers match the render CLI names (rgb, depth,
accumulation, seg_pred, wv_i, abundances_i, residual_i).

Usage:
    python -m umhs_tpu.cli.viewer --load-config outputs/<exp>/umhsnerf/config.yml \
        [--port 7007] [--resolution 128]
"""

from __future__ import annotations

import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>umhs viewer</title><style>
body{background:#111;color:#ddd;font-family:monospace;margin:0;display:flex}
#panel{padding:12px;width:230px}#img{flex:1;display:flex;align-items:center;justify-content:center}
img{image-rendering:pixelated;max-width:95%;max-height:95vh}
label{display:block;margin-top:8px}select,input{width:100%}
</style></head><body>
<div id=panel>
<h3>umhs_tpu viewer</h3>
<label>output <select id=output></select></label>
<label>theta <input type=range id=theta min=0 max=6.283 step=0.05 value=0.8></label>
<label>phi <input type=range id=phi min=-1.4 max=1.4 step=0.05 value=0.5></label>
<label>radius <input type=range id=radius min=0.3 max=3 step=0.05 value=1.0></label>
<label>fov <input type=range id=fov min=20 max=90 step=1 value=50></label>
<div id=status></div>
</div>
<div id=img><img id=frame></div>
<script>
let busy=false, dirty=true;
async function init(){
  const outs = await (await fetch('/outputs')).json();
  const sel = document.getElementById('output');
  for (const o of outs){const e=document.createElement('option');e.textContent=o;sel.appendChild(e);}
  sel.onchange=()=>{dirty=true}; tick();
}
for (const id of ['theta','phi','radius','fov'])
  document.getElementById(id).oninput=()=>{dirty=true};
async function tick(){
  if (dirty && !busy){
    busy=true; dirty=false;
    const q = new URLSearchParams();
    for (const id of ['theta','phi','radius','fov']) q.set(id, document.getElementById(id).value);
    q.set('output', document.getElementById('output').value || 'rgb');
    const t0 = performance.now();
    const r = await fetch('/render?'+q);
    const blob = await r.blob();
    document.getElementById('frame').src = URL.createObjectURL(blob);
    document.getElementById('status').textContent = `${(performance.now()-t0).toFixed(0)} ms`;
    busy=false;
  }
  setTimeout(tick, 60);
}
init();
</script></body></html>"""


class ViewerState:
    """Holds the trainer + render helpers; renders an orbit camera view."""

    def __init__(self, trainer, resolution: int = 128):
        self.trainer = trainer
        self.resolution = resolution
        self.lock = threading.Lock()

    def output_names(self):
        names = ["rgb", "depth", "accumulation"]
        if "spectral" in self.trainer.model_config.method:
            bands = len(self.trainer.model.wavelengths)
            k = self.trainer.model.num_classes
            names += ["seg_pred"]
            names += [f"abundances_{i}" for i in range(k)]
            names += [f"wv_{i}" for i in range(0, bands, max(1, bands // 8))]
            if self.trainer.model_config.pred_specular:
                names += [f"residual_{i}" for i in range(0, bands, max(1, bands // 4))]
        return names

    def render_view(
        self, theta: float, phi: float, radius: float, fov: float, output: str = "rgb"
    ) -> np.ndarray:
        import jax.numpy as jnp

        from ..data.cameras import generate_camera_rays
        from ..data.synthetic import _look_at
        from .render import select_output

        h = w = self.resolution
        eye = radius * np.array(
            [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)]
        )
        c2w = _look_at(eye, np.zeros(3))[:3]
        focal = 0.5 * h / np.tan(0.5 * np.deg2rad(fov))
        cam = {
            "c2w": jnp.asarray(c2w, jnp.float32)[None],
            "fx": jnp.asarray([focal]),
            "fy": jnp.asarray([focal]),
            "cx": jnp.asarray([w / 2.0]),
            "cy": jnp.asarray([h / 2.0]),
        }
        rays = generate_camera_rays(cam, 0, h, w)
        with self.lock:
            outputs = self.trainer.render_camera(rays, (h, w))
        img = select_output(outputs, output)
        return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def make_handler(state: ViewerState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="text/html"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                self._send(200, _PAGE.encode())
            elif url.path == "/outputs":
                self._send(
                    200, json.dumps(state.output_names()).encode(), "application/json"
                )
            elif url.path == "/render":
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                try:
                    img = state.render_view(
                        float(q.get("theta", 0.8)),
                        float(q.get("phi", 0.5)),
                        float(q.get("radius", 1.0)),
                        float(q.get("fov", 50.0)),
                        q.get("output", "rgb"),
                    )
                    from PIL import Image

                    buf = io.BytesIO()
                    Image.fromarray(img).save(buf, format="PNG")
                    self._send(200, buf.getvalue(), "image/png")
                except Exception as e:  # surface render errors to the UI
                    self._send(500, f"render error: {e}".encode(), "text/plain")
            else:
                self._send(404, b"not found", "text/plain")

    return Handler


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    from ..configs import load_config
    from ..engine.trainer import Trainer

    opts = {}
    i = 0
    while i < len(argv):
        opts[argv[i].lstrip("-").replace("-", "_")] = argv[i + 1]
        i += 2
    assert "load_config" in opts, "--load-config is required"

    config = load_config(Path(opts["load_config"]))
    trainer = Trainer(
        config.trainer,
        config.pipeline.model,
        config.pipeline.datamanager,
        num_classes=config.pipeline.num_classes,
    )
    trainer.setup()
    trainer.load_checkpoint(trainer.checkpoint_dir)

    state = ViewerState(trainer, resolution=int(opts.get("resolution", 128)))
    port = int(opts.get("port", 7007))
    server = ThreadingHTTPServer(("0.0.0.0", port), make_handler(state))
    print(f"[umhs-viewer] serving on http://localhost:{port} "
          f"(outputs: {', '.join(state.output_names()[:6])}, ...)")
    server.serve_forever()


if __name__ == "__main__":
    main()
