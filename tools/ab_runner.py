"""Unattended TPU A/B runner: waits for the tunneled device to come back,
then runs the perf measurement sequence SERIALLY (the host cannot take two
compile-heavy JAX jobs at once), appending JSON lines to --log.

Each stage runs as a subprocess with its own timeout so a wedged tunnel
kills the stage, not the runner; stages retry on the next probe success.

Usage: python tools/ab_runner.py [--log /tmp/ab_results.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = (
    "import jax,time;t0=time.time();import jax.numpy as jnp;"
    "x=jnp.ones((256,256));print('probe-ok',float((x@x).sum()),flush=True);"
    "import os;os._exit(0)"
)

# (name, argv, timeout_s, extra_env) — new-information stages first so a
# briefly-healed tunnel yields the most useful numbers before re-wedging.
# Round-4 measured results live in bench_results/ab_r04.jsonl (committed);
# round-5 queue re-proves the headline + captioner + batch + tiled-cache
# numbers for the driver record (VERDICT r4 item 1) and re-tries the two
# stages that failed on the half-dead tunnel (full4k OOM, vae8k timeout).
# captioner_int4_native stays REMOVED: eager s4 buffers crash through the
# tunneled backend (known; int4_paired is the production native-cast path).
STAGES = [
    # phase-4 queue (post regression fix): the hunt proved the 8.43->9.19
    # headline delta was the GEGLU exact-erf gelu (gelu_approx=1 on current
    # code measured 8.426 == r3's 8.428; the r4mid worktree with erf gelu
    # measured 9.193). d1f694e makes bf16 default to tanh gelu — this
    # stage certifies the fix at head:
    ("headline_fixed", [sys.executable, "bench.py"], 1500, None),
    # e2e previously RESOURCE_EXHAUSTED at stage1@512 (engine ~8 GB +
    # captioner ~7.6 GB + workspace > 16 GB HBM): now phase-split into two
    # residency sets (engine phases, then swap to captioner) — see
    # bench_e2e docstring.
    ("e2e", [sys.executable, "bench.py", "--e2e"], 3600, None),
    ("batch4", [sys.executable, "bench.py", "--batch", "4"], 1800, None),
    ("full4k", [sys.executable, "bench.py", "--full4k"], 2400, None),
    ("full4k_cache2", [sys.executable, "bench.py", "--full4k",
                       "--cache_interval", "2"], 2400, None),
    ("pair_kernel_check", [sys.executable, "tools/pair_kernel_check.py"],
     900, None),
    ("captioner_fp_kv8", [sys.executable, "bench.py", "--captioner",
                          "--fused_pairs", "--kv_int8"], 1800, None),
    ("batch2", [sys.executable, "bench.py", "--batch", "2"], 1500, None),
    ("headline_cache2", [sys.executable, "bench.py",
                         "--cache_interval", "2"], 1500, None),
    ("vae8k", [sys.executable, "bench.py", "--vae8k"], 1800, None),
]


def run(cmd, timeout, extra_env=None, name=None):
    t0 = time.time()
    env = None
    if extra_env:
        env = dict(os.environ, **extra_env)
    try:
        p = subprocess.run(
            cmd, cwd=ROOT, timeout=timeout, capture_output=True, text=True,
            env=env,
        )
        if name:
            # full output per stage: OOM reports put the largest program
            # allocations at the HEAD, which a 4000-char tail amputates
            with open(f"/tmp/ab_stage_{name}.log", "w") as f:
                f.write(p.stdout + "\n--- stderr ---\n" + p.stderr)
        tail = (p.stdout + p.stderr)[-4000:]
        return {"rc": p.returncode, "s": round(time.time() - t0, 1), "tail": tail}
    except subprocess.TimeoutExpired as e:
        # keep whatever the stage printed before the deadline — a timeout
        # with no tail is undiagnosable
        parts = []
        for b in (e.stdout, e.stderr):
            if b:
                parts.append(b if isinstance(b, str) else b.decode(errors="replace"))
        tail = ("TIMEOUT\n" + "\n".join(parts))[-4000:]
        return {"rc": -9, "s": round(time.time() - t0, 1), "tail": tail}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", default="/tmp/ab_results.jsonl")
    ap.add_argument("--probe_every", type=int, default=120)
    ap.add_argument("--max_hours", type=float, default=6.0)
    ap.add_argument(
        "--only", nargs="*", default=None,
        help="run only these stage names (follow-up instances re-measuring "
        "a stage that was retired before its fix landed)",
    )
    args = ap.parse_args()

    global STAGES
    if args.only:
        unknown = set(args.only) - {n for n, *_ in STAGES}
        assert not unknown, f"unknown stages: {unknown}"
        STAGES = [s for s in STAGES if s[0] in args.only]

    done = set()
    fails: dict[str, int] = {}
    t_start = time.time()
    while len(done) < len(STAGES) and time.time() - t_start < args.max_hours * 3600:
        pr = run([sys.executable, "-c", PROBE], 90)
        alive = pr["rc"] == 0 and "probe-ok" in pr["tail"]
        print(f"probe alive={alive} ({pr['s']}s)", flush=True)
        if not alive:
            time.sleep(args.probe_every)
            continue
        for name, cmd, to, extra_env in STAGES:
            if name in done:
                continue
            print(f"=== {name}: {' '.join(cmd)}", flush=True)
            r = run(cmd, to, extra_env, name=name)
            rec = {"stage": name, **r, "ts": time.time()}
            with open(args.log, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"=== {name} rc={r['rc']} {r['s']}s", flush=True)
            if r["rc"] != 0:
                # tunnel likely died mid-stage; back to probing — but a
                # stage that fails twice WITH a live tunnel is a real bug,
                # not weather: retire it so it can't block the queue
                fails[name] = fails.get(name, 0) + 1
                if fails[name] >= 2:
                    print(f"=== {name} retired after {fails[name]} failures",
                          flush=True)
                    done.add(name)
                break
            done.add(name)
    print(f"done stages: {sorted(done)}", flush=True)


if __name__ == "__main__":
    main()
