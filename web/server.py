#!/usr/bin/env python
"""Tiny detection-viewer server (reference ``web/server.py`` analog).

Serves rendered detection overlays from an eval run:
  /            -> viewer page
  /detindex    -> JSON list of available rendered frames
  /image?name= -> one rendered frame

Point it at a directory of overlay PNGs produced by ``eval.py --display``
(or any image dump).
"""

import argparse
import json
import os
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

INDEX_HTML = """<!doctype html>
<html><head><title>stmask-tpu detections</title>
<style>
 body { background:#111; color:#eee; font-family:sans-serif; margin:20px; }
 img { max-width: 100%; border: 1px solid #444; }
 button { margin: 4px; }
</style></head>
<body>
<h2>stmask-tpu detection viewer</h2>
<div>
 <button onclick="step(-1)">prev</button>
 <span id="label"></span>
 <button onclick="step(1)">next</button>
</div>
<img id="view"/>
<script>
let frames = [], idx = 0;
fetch('/detindex').then(r => r.json()).then(d => { frames = d; show(); });
function show() {
  if (!frames.length) return;
  document.getElementById('view').src = '/image?name=' + frames[idx];
  document.getElementById('label').textContent =
      (idx + 1) + ' / ' + frames.length + '  ' + frames[idx];
}
function step(d) { idx = (idx + d + frames.length) % frames.length; show(); }
document.addEventListener('keydown', e => {
  if (e.key === 'ArrowRight') step(1);
  if (e.key === 'ArrowLeft') step(-1);
});
</script></body></html>
"""


def make_handler(image_dir):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, ctype, body):
            self.send_response(code)
            self.send_header('Content-Type', ctype)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == '/':
                self._send(200, 'text/html', INDEX_HTML.encode())
            elif url.path == '/detindex':
                names = sorted(f for f in os.listdir(image_dir)
                               if f.lower().endswith(('.png', '.jpg',
                                                      '.jpeg')))
                self._send(200, 'application/json',
                           json.dumps(names).encode())
            elif url.path == '/image':
                name = parse_qs(url.query).get('name', [''])[0]
                path = os.path.join(image_dir, os.path.basename(name))
                if os.path.exists(path):
                    with open(path, 'rb') as f:
                        self._send(200, 'image/png', f.read())
                else:
                    self._send(404, 'text/plain', b'not found')
            else:
                self._send(404, 'text/plain', b'not found')

        def log_message(self, *a):
            pass

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--image_dir', default='results/display')
    p.add_argument('--port', type=int, default=8080)
    args = p.parse_args()
    server = HTTPServer(('0.0.0.0', args.port),
                        make_handler(args.image_dir))
    print(f'serving {args.image_dir} on http://localhost:{args.port}')
    server.serve_forever()


if __name__ == '__main__':
    main()
