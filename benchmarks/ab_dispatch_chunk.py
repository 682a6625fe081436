"""A/B the build dispatch-chunk width (ZVEC_HNSW_DISPATCH_CHUNK).

The clustered forward-prune and NN-descent loops pay ~1s of tunnel
dispatch+fetch latency per call (BASELINE.md r4 phase table); wider chunks
amortize it but lengthen the compiled program (slower remote compile, and
the tunneled worker has crashed on long programs before). This builds the
SAME clustered corpus once per chunk width through the raw engine (no
collection overhead) and records the ZVEC_BUILD_LOG phase lines.

Usage:  AB_N=2500000 AB_CHUNKS=32,96 python benchmarks/ab_dispatch_chunk.py
Output: /tmp/ab_dispatch_chunk.json (phase lines + totals per width).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("AB_N", 2_500_000))
D = 128
CHUNKS = tuple(int(x) for x in os.environ.get("AB_CHUNKS", "32,96").split(","))


def log(msg):
    print(f"[ab-chunk {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    os.environ["ZVEC_BUILD_LOG"] = "1"
    from benchmarks.h2h import make_data
    from zvec_tpu.core.hnsw import HnswEngine
    from zvec_tpu.model.param.param import HnswIndexParam
    from zvec_tpu.typing import MetricType

    log(f"generating clustered {N}x{D}")
    X, _ = make_data("clustered", N, D, nq=8)

    results = {"n": N, "dim": D, "platform": "tpu", "configs": {}}
    for chunk in CHUNKS:
        os.environ["ZVEC_HNSW_DISPATCH_CHUNK"] = str(chunk)
        eng = HnswEngine(
            MetricType.L2, D, HnswIndexParam(MetricType.L2, m=50, ef_construction=500)
        )
        eng.bind_data(lambda: X, lambda: 1)
        buf = io.StringIO()
        t0 = time.time()

        class Tee(io.TextIOBase):
            def write(self, s):
                buf.write(s)
                sys.__stdout__.write(s)
                sys.__stdout__.flush()
                return len(s)

        with redirect_stdout(Tee()):
            eng._ensure_fresh()
        total = time.time() - t0
        phases = [
            ln.strip() for ln in buf.getvalue().splitlines()
            if "[knn-build]" in ln
        ]
        results["configs"][str(chunk)] = {"total_s": round(total, 1), "phases": phases}
        log(f"chunk={chunk}: total {total:.0f}s")
        del eng
        with open("/tmp/ab_dispatch_chunk.json", "w") as fh:
            json.dump(results, fh, indent=1)

    print(json.dumps({k: v["total_s"] for k, v in results["configs"].items()}))


if __name__ == "__main__":
    main()
