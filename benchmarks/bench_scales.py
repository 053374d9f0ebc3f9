"""Driver-reproducible multi-scale bench capture (round-3 VERDICT weak #3).

Runs the root bench.py once per model scale as a SUBPROCESS (each scale
needs a fresh HBM arena — a 13B int4 model cannot coexist with the 1B's
buffers) and writes one artifact per scale:

    BENCH_{scale}_r{round}.json   — the bench's own JSON line + metadata

Usage:
    python benchmarks/bench_scales.py --round 4 [--scales 1b,7b,13b]
        [--env BENCH_SPEC=8] [--out-dir .]

The per-scale env defaults are bench.py's own (batch, quantization, decode
budget per scale — see bench.py header). Extra --env KEY=VAL pairs apply to
every scale. Artifacts are committed so README's 7B/13B numbers are
reproducible records, not prose.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def run_scale(scale: str, extra_env: dict, timeout: int) -> dict:
    env = dict(os.environ, BENCH_MODEL=scale, **extra_env)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=timeout)
    wall = time.time() - t0
    line = ""
    for ln in proc.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            line = ln
    rec = {"scale": scale, "wall_sec": round(wall, 1),
           "returncode": proc.returncode,
           "extra_env": extra_env}
    if line:
        rec["result"] = json.loads(line)
    else:
        rec["stdout_tail"] = proc.stdout[-2000:]
        rec["stderr_tail"] = proc.stderr[-2000:]
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--scales", default="1b,7b,13b")
    p.add_argument("--env", action="append", default=[],
                   help="KEY=VAL applied to every scale (repeatable)")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--timeout", type=int, default=3600)
    args = p.parse_args(argv)
    extra = dict(kv.split("=", 1) for kv in args.env)
    for scale in args.scales.split(","):
        rec = run_scale(scale.strip(), extra, args.timeout)
        out = os.path.join(args.out_dir,
                           f"BENCH_{scale.strip()}_r{args.round:02d}.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=2)
        ok = "ok" if rec.get("result") else f"FAILED rc={rec['returncode']}"
        val = rec.get("result", {}).get("value")
        print(f"[bench_scales] {scale}: {ok} value={val} -> {out}",
              flush=True)


if __name__ == "__main__":
    main()
