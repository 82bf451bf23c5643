"""Collect on-chip measurement logs into a summary.

Reads .bench_logs/*.log (written by the scripts/run_round*_until_done.sh
drivers and ad-hoc sweeps), extracts the one-line JSON of bench runs and
the PSNR / train-time lines of quality runs, and writes a QUALITY json
plus a markdown summary to stdout.

    python scripts/collect_results.py [--write QUALITY_r4.json] [--prefix r4_]

--write only emits entries whose .ok completion marker exists (done
runs); partial logs still show in the stdout table with their status.
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
LOGS = REPO / ".bench_logs"


def parse_log(path: Path) -> dict | None:
    text = path.read_text(errors="replace")
    if "Unable to initialize backend" in text:
        return {"status": "backend_unavailable"}
    out: dict = {"status": "ok"}
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                out.update(json.loads(line))
            except json.JSONDecodeError:
                pass
        m = re.match(r"PSNR: ([0-9.]+)", line)
        if m:
            out["psnr"] = float(m.group(1))
        m = re.match(r"train_time_s: ([0-9.]+)", line)
        if m:
            out["train_time_s"] = float(m.group(1))
    if len(out) == 1:
        out["status"] = "no_result"
        out["tail"] = text.strip().splitlines()[-1][:200] if text.strip() else ""
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--write", default=None, metavar="FILE",
        help="write the collected results json (e.g. QUALITY_r4.json) "
        "at the repo root",
    )
    ap.add_argument(
        "--prefix", default="",
        help="only collect logs whose name starts with this prefix",
    )
    args = ap.parse_args()
    if not LOGS.is_dir():
        print("no .bench_logs directory")
        return 1
    results = {}
    for log in sorted(LOGS.glob("*.log")):
        name = log.stem
        if args.prefix and not name.startswith(args.prefix):
            continue
        parsed = parse_log(log)
        parsed["done"] = (LOGS / f"{name}.ok").exists()
        results[name] = parsed

    print("| step | status | result |")
    print("|---|---|---|")
    for name, r in results.items():
        if r.get("value") is not None:
            res = (f"{r['value']:,.0f} {r.get('unit', '')} "
                   f"(vs_baseline {r.get('vs_baseline')})")
        elif r.get("psnr") is not None:
            res = (f"PSNR {r['psnr']} @ {r.get('train_time_s', '?')}s")
        else:
            res = r.get("tail", "")
        ok = "ok" if r["done"] else r["status"]
        print(f"| {name} | {ok} | {res} |")

    if args.write:
        quality = {
            n: {k: v for k, v in r.items() if k in
                ("psnr", "train_time_s", "value", "unit", "vs_baseline",
                 "model", "grid", "quant_int8", "visible_budget_ratio",
                 "field_budget_ratio", "fused_march", "rays_per_s",
                 "done")}
            for n, r in results.items()
            if r["status"] == "ok" and r["done"]
        }
        # merge with an existing file: completed entries from earlier
        # driver sessions survive a .bench_logs wipe (fresh checkout);
        # freshly collected entries win on name collision
        target = REPO / args.write
        if target.exists():
            try:
                prior = json.loads(target.read_text())
            except json.JSONDecodeError:
                prior = {}
            quality = {**prior, **quality}
        (REPO / args.write).write_text(
            json.dumps(quality, indent=1) + "\n"
        )
        print(f"\nwrote {args.write} ({len(quality)} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
