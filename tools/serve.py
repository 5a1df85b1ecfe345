"""Serve an exported model artifact over HTTP.

``python tools/serve.py model.shlo [--host 0.0.0.0] [--port 8000]
[--buckets 16 64 256]``

Endpoints (see ``semi_seg_ecg_tpu.serving.make_http_server``):
- ``GET /v1/metadata`` — artifact header + bucket sizes (JSON)
- ``POST /v1/predict`` — ``.npy`` float32 ``(B, leads, T)`` body →
  ``.npy`` softmax probabilities ``(B, C, T)``

Client example::

    import io, urllib.request, numpy as np
    buf = io.BytesIO(); np.save(buf, x)          # x: (B, 1, T) float32
    req = urllib.request.Request("http://host:8000/v1/predict",
                                 data=buf.getvalue(), method="POST")
    probs = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semi_seg_ecg_tpu.serving import make_http_server  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser("ECG segmentation model server")
    ap.add_argument("artifact", help="path to a .shlo serving artifact "
                                     "(tools/export_model.py)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--buckets", type=int, nargs="+", default=[16, 64, 256],
                    help="batch buckets for symbolic-batch artifacts")
    args = ap.parse_args(argv)

    server = make_http_server(args.artifact, host=args.host, port=args.port,
                              bucket_sizes=tuple(args.buckets))
    print(json.dumps({"listening": f"http://{args.host}:"
                                   f"{server.server_address[1]}",
                      "artifact": args.artifact,
                      "buckets": args.buckets}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])
