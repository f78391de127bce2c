"""Gate-checked single-level scaling measurement.

Runs ``bench.py --one <cores>`` at ``SPARK_GRAFT_TOKEN_ROWS`` rows ONLY if
the host passes the calibrated contention gate (bench.LOAD_BOUND /
bench.BURN_BOUND), recording the contention snapshot before and after so
the resulting JSON line self-describes its window quality (BASELINE.md
protocol: attempts inside hot windows are discarded, not averaged).

Usage:  SPARK_GRAFT_TOKEN_ROWS=32000000 python scripts/scale_point.py 32 \
            [--wait-clean SECONDS]
Appends one JSON line per completed run to scripts/scale_points.jsonl.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402

OUT = os.path.join(REPO, "scripts", "scale_points.jsonl")


def main() -> int:
    cores = int(sys.argv[1])
    wait = 0
    if "--wait-clean" in sys.argv:
        wait = int(sys.argv[sys.argv.index("--wait-clean") + 1])
    deadline = time.monotonic() + wait
    while True:
        snap = bench.contention_snapshot()
        clean = (
            snap["load_avg"][0] <= bench.LOAD_BOUND
            and snap["single_core_burn_sec"] <= bench.BURN_BOUND
        )
        if clean:
            break
        if time.monotonic() >= deadline:
            print(json.dumps({"skipped": "gate", "cores": cores, **snap}))
            return 1
        time.sleep(60)

    env = {**os.environ}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--one", str(cores)],
        capture_output=True, text=True, env=env,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(proc.stdout[-2000:], proc.stderr[-2000:])
        return 2
    rec = json.loads(lines[-1])
    rec["token_rows"] = int(os.environ.get("SPARK_GRAFT_TOKEN_ROWS", "400000"))
    rec["contention_start"] = snap
    rec["contention_end"] = bench.contention_snapshot()
    rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(OUT, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
