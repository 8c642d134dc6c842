"""Minimal HTTP serving host for an exported predictor artifact.

Loads a ``dpivae_tpu.serving.save_predictor`` StableHLO artifact (no model
code, case definition, or checkpoint required) and serves it over HTTP with
nothing but the standard library:

    python examples/serve_http.py --artifact output/run/models/predictor.shlo \
        --port 8787

    GET  /meta                 -> the artifact's .meta.json contract
    POST /predict              -> {"x": [[...]], "c": [[...]], "seed": 0}
                                  => {"y": [[...]], ...named outputs}

The batch dimension is shape-polymorphic in the artifact, so any request
size compiles once per backend and serves thereafter. The host is a
``ThreadingHTTPServer`` — one handler thread per connection; concurrent
requests are safe because ``ServedPredictor.__call__`` is pure (jax's jit
dispatch is thread-safe and the params live inside the compiled program;
pinned by tests/test_serving.py::test_served_predictor_thread_safety and
the http_concurrent script test). This is still a demo host — no auth, no
request limits; put a real frontend in front for production.
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from dpivae_tpu.serving import load_predictor


def make_handler(served):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/meta":
                self._send(200, served.meta)
            else:
                self._send(404, {"error": f"unknown path {self.path!r}"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": f"unknown path {self.path!r}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                x = np.asarray(req["x"], np.float32)
                c = np.asarray(req["c"], np.float32)
                if x.ndim != 2 or c.ndim != 2 or x.shape[0] != c.shape[0]:
                    raise ValueError(
                        f"x and c must be rank-2 with equal batch; got "
                        f"{x.shape} and {c.shape}"
                    )
                if x.shape[1] != served.meta["nd_x"]:
                    raise ValueError(
                        f"x must have {served.meta['nd_x']} columns, "
                        f"got {x.shape[1]}"
                    )
                if c.shape[1] != served.meta["nd_c"]:
                    raise ValueError(
                        f"c must have {served.meta['nd_c']} columns, "
                        f"got {c.shape[1]}"
                    )
                out = served(x, c, seed=int(req.get("seed", 0)))
                self._send(
                    200, {name: v.tolist() for name, v in out.items()}
                )
            except (KeyError, ValueError, TypeError, json.JSONDecodeError) as e:
                self._send(400, {"error": str(e)})

        def log_message(self, fmt, *args):  # quiet by default
            pass

    return Handler


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--artifact", required=True,
                        help="path to a save_predictor .shlo artifact")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    args = parser.parse_args()

    served = load_predictor(args.artifact)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(served))
    print(f"serving {args.artifact} "
          f"(outputs={list(served.outputs)}) on "
          f"http://{args.host}:{server.server_address[1]}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
