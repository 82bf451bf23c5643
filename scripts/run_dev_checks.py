"""Local dev-check runner (reference ``scripts/run_dev_checks.py:11-68``).

The reference parses ``.github/workflows/code_checks.yml`` and replays its
named lint steps locally, then runs pytest + a sphinx build. Here the
equivalent sequence is:

  1. syntax check of every tree (`compileall`);
  2. the workflow's lint steps (isort/black), skipped with a notice when
     the tools are not installed (this image ships no linters);
  3. the full pytest suite on the virtual 8-device CPU mesh — the same
     configuration CI runs (the reference could not run its CUDA tests
     in CI at all);
  4. a docs sanity pass (every markdown doc parses, internal links
     resolve to files).

Exit code is non-zero if any non-skipped step fails.

    python scripts/run_dev_checks.py [--fast]   # --fast: skip pytest
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TREES = ["nerfacc_tpu", "tests", "examples", "scripts"]


def run(name: str, cmd: list[str], env: dict | None = None) -> bool:
    print(f"== {name}: {' '.join(cmd)}")
    proc = subprocess.run(cmd, cwd=REPO, env=env)
    ok = proc.returncode == 0
    print(f"   {'ok' if ok else 'FAILED'}")
    return ok


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="skip pytest")
    args = ap.parse_args()
    failures = []

    if not run("syntax", [sys.executable, "-m", "compileall", "-q", *TREES]):
        failures.append("syntax")

    for tool, extra in (("isort", ["--profile", "black", "--check"]),
                        ("black", ["--check"])):
        if importlib.util.find_spec(tool) is None:
            print(f"== {tool}: not installed, skipped")
            continue
        if not run(tool, [sys.executable, "-m", tool, *extra, *TREES]):
            failures.append(tool)

    # docs sanity: markdown files exist and their relative links resolve
    print("== docs: checking markdown links")
    bad = []
    for md in (REPO / "docs").glob("*.md"):
        text = md.read_text()
        for m in re.finditer(r"\]\(([^)#]+?)(?:#[^)]*)?\)", text):
            target = m.group(1)
            if "://" in target or target.startswith("mailto:"):
                continue
            if not (md.parent / target).exists():
                bad.append(f"{md.name} -> {target}")
    if bad:
        print("   FAILED: " + "; ".join(bad))
        failures.append("docs")
    else:
        print("   ok")

    if not args.fast:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8"
            ).strip()
        if not run(
            "pytest (8-device CPU mesh)",
            [sys.executable, "-m", "pytest", "tests/", "-q"],
            env=env,
        ):
            failures.append("pytest")

    if failures:
        print(f"\nFAILED: {', '.join(failures)}")
        return 1
    print("\nall checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
