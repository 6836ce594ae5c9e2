"""(bq, bk) calibration sweep for the TILED flash-attention kernels
(VERDICT r3 item 7: re-attack the tiled backward's isolated A/B loss).

Runs bench_attention --only=<video shape> once per candidate plan via the
DAVF_TILED_PLAN_FWD/_BWD trace-time overrides (ops/pallas/flash_attention
._plan_override) in fresh subprocesses (the flags are read at trace time,
so an in-process sweep would reuse the first compiled program), and prints
a table + ONE JSON line with the best plan per direction.

Usage: python bench_tiled_sweep.py [--shape=video_joint_1568] [--batch=64]
                                   [--plans=bq,bk[:hg][;bq,bk[:hg]...]]

--plans overrides the built-in candidate grid with an explicit list (each
entry "bq,bk" or "bq,bk:hg"), for time-boxed sweeps through the tunnel
where every new plan is a fresh remote compile.
"""
import json
import os
import re
import subprocess
import sys


def run_one(shape, batch, fwd_plan=None, bwd_plan=None, hg=None):
    env = dict(os.environ)
    env.pop("DAVF_TILED_PLAN_FWD", None)
    env.pop("DAVF_TILED_PLAN_BWD", None)
    env.pop("DAVF_TILED_HG", None)
    if fwd_plan:
        env["DAVF_TILED_PLAN_FWD"] = fwd_plan
    if bwd_plan:
        env["DAVF_TILED_PLAN_BWD"] = bwd_plan
    if hg:
        env["DAVF_TILED_HG"] = str(hg)
    p = subprocess.run(
        [sys.executable, "bench_attention.py", str(batch), f"--only={shape}"],
        capture_output=True, text=True, env=env, timeout=3000)
    if p.returncode:
        return None, (p.stderr or p.stdout)[-500:]
    line = p.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    row = next(iter(d["shapes"].values()))
    return row, None


def main():
    shape = "video_joint_1568"
    batch = 64
    plans_arg = None
    for a in sys.argv[1:]:
        if a.startswith("--shape="):
            shape = a.split("=", 1)[1]
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
        if a.startswith("--plans="):
            plans_arg = a.split("=", 1)[1]
    n = int(re.search(r"(\d+)$", shape).group(1))

    if plans_arg:
        candidates = []
        for entry in plans_arg.split(";"):
            entry = entry.strip()
            if not entry:
                continue
            plan, _, hg = entry.partition(":")
            candidates.append((plan, int(hg) if hg else 1))
    else:
        # candidates: whole-row Q first (single Q step, no scratch
        # revisits), then descending 128-multiples; KV chunks large->small.
        bqs = list(dict.fromkeys(
            [n, 1024, 768, 512] if n >= 1536 else [n, 512]))
        bks = [n, 768, 512, 256, 128]
        candidates = []
        for hg in (1, 2, 4):
            for bq in bqs:
                for bk in bks:
                    if bk > n or bq > n:
                        continue
                    if hg > 1 and (bq != bqs[-1] or bk not in (256, 512)):
                        continue  # hg only at the leanest plans (VMEM x hg)
                    candidates.append((f"{bq},{bk}", hg))

    results = []
    base, err = run_one(shape, batch)          # planner defaults
    if err:
        print("baseline run failed:", err, file=sys.stderr)
        sys.exit(1)
    print(f"default plan: {json.dumps(base)}", file=sys.stderr, flush=True)
    results.append(("default", base))

    for plan, hg in candidates:
        tag = f"{plan} hg{hg}"
        row, err = run_one(shape, batch, fwd_plan=plan, bwd_plan=plan,
                           hg=hg)
        if err:
            print(f"plan {tag}: FAILED "
                  f"{err.splitlines()[-1] if err.splitlines() else err}",
                  file=sys.stderr, flush=True)
            continue
        print(f"plan {tag}: fwd {row.get('pallas_fwd_us')} us, "
              f"bwd {row.get('pallas_bwd_us')} us "
              f"(xla {row.get('xla_fwd_us')}/{row.get('xla_bwd_us')})",
              file=sys.stderr, flush=True)
        results.append((tag, row))

    ok = [(p, r) for p, r in results if r.get("pallas_bwd_us")]
    best_bwd = min(ok, key=lambda t: t[1]["pallas_bwd_us"])
    best_fwd = min(ok, key=lambda t: t[1]["pallas_fwd_us"])
    print(json.dumps({
        "metric": f"tiled plan sweep {shape}",
        "value": best_bwd[1]["pallas_bwd_us"],
        "unit": "us best pallas bwd",
        "vs_baseline": round(best_bwd[1]["pallas_bwd_us"]
                             / max(base.get("xla_bwd_us", 1), 1), 3),
        "best_bwd_plan": best_bwd[0], "best_fwd_plan": best_fwd[0],
        "best_fwd_us": best_fwd[1]["pallas_fwd_us"],
        "xla_fwd_us": base.get("xla_fwd_us"),
        "xla_bwd_us": base.get("xla_bwd_us"),
        "rows": [{"plan": p, **{k: v for k, v in r.items()
                                if k.endswith("_us")}} for p, r in results],
    }))


if __name__ == "__main__":
    main()
