"""Scaling experiments (analog of the reference's experiments/ scripts that
produced the paper's Cholesky/TSQR/GEMM scaling plots — SURVEY §2).

Runs one algorithm across a size ladder on the current backend and prints a
JSON line per point (same schema as bench.py), e.g.:

    python experiments/scaling.py --alg cholesky --sizes 8192 16384 32768
    python experiments/scaling.py --alg tsqr --sizes 262144 1048576 4194304
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--alg", default="cholesky", choices=["cholesky", "gemm", "tsqr", "bdfac"])
    p.add_argument("--sizes", type=int, nargs="+", default=None)
    p.add_argument("--extra", nargs="*", default=[])
    args = p.parse_args()

    sizes = args.sizes or {
        "cholesky": [4096, 8192, 16384, 32768],
        "gemm": [2048, 4096, 8192, 16384],
        "tsqr": [1 << 18, 1 << 20, 1 << 22],
        "bdfac": [2048, 4096, 8192, 16384],
    }[args.alg]

    results = []
    for n in sizes:
        cmd = [sys.executable, os.path.join(REPO, "bench.py"),
               "--alg", args.alg, "--n", str(n)] + args.extra
        out = subprocess.run(cmd, capture_output=True, text=True)
        if out.returncode != 0:
            print(json.dumps({"n": n, "error": out.stderr.strip()[-200:]}), flush=True)
            continue
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if results:
        best = max(results, key=lambda r: r["value"])
        print(f"# peak: {best['value']} {best['unit']} at {best['metric']}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
