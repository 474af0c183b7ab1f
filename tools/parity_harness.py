"""Numerical-parity harness vs. the Java RankLib jar (SURVEY.md §4).

Runs the SAME train/test files through this framework's CLI and through
``java -jar RankLib.jar`` with equivalent flags, then compares:

* the printed train/test metric (target: NDCG@10 within ±0.002 —
  BASELINE.json north star);
* model-file cross-loading: our saved model evaluated by the jar and the
  jar's model evaluated by us must score identically (±1e-4 per query).

The reference mount (/root/reference) was EMPTY at build time and no JVM
ships in this image, so this harness self-skips unless both a jar and a
``java`` binary are reachable. Usage once they are::

    python tools/parity_harness.py --jar RankLib.jar \
        --train train.txt --test test.txt [--ranker 6] [--metric NDCG@10]

Exit code 0 = parity holds, 1 = divergence, 2 = prerequisites missing.
"""

from __future__ import annotations

import argparse
import re
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

TOL_METRIC = 0.002
TOL_SCORE = 1e-4


def _run(cmd: list[str]) -> str:
    print("+", " ".join(cmd), file=sys.stderr)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    if out.returncode != 0:
        print(out.stdout + out.stderr, file=sys.stderr)
        raise RuntimeError(f"command failed: {cmd[0]}")
    return out.stdout


def _metric_from_output(text: str, which: str) -> float:
    # both CLIs print "<METRIC> on <which> data: <value>"
    m = re.search(rf"on {which} data:\s*([0-9.]+)", text)
    if not m:
        raise RuntimeError(f"no '{which}' metric in output:\n{text}")
    return float(m.group(1))


def _scores(cli: list[str], model: str, test: str, out: str) -> list[float]:
    _run(cli + ["-load", model, "-rank", test, "-score", out])
    vals = []
    for line in Path(out).read_text().splitlines():
        parts = line.split()
        if parts:
            vals.append(float(parts[-1]))
    return vals


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--jar", required=True)
    ap.add_argument("--train", required=True)
    ap.add_argument("--test", required=True)
    ap.add_argument("--ranker", type=int, default=6)
    ap.add_argument("--metric", default="NDCG@10")
    ap.add_argument("--extra", nargs="*", default=[],
                    help="extra flags passed to BOTH CLIs (e.g. -tree 100)")
    args = ap.parse_args()

    if shutil.which("java") is None:
        print("SKIP: no java binary on PATH", file=sys.stderr)
        return 2
    if not Path(args.jar).exists():
        print(f"SKIP: jar not found: {args.jar}", file=sys.stderr)
        return 2

    tmp = Path(tempfile.mkdtemp(prefix="parity_"))
    ours_cli = [sys.executable, "-m", "ranklib_tpu"]
    java_cli = ["java", "-jar", args.jar]
    common = ["-train", args.train, "-test", args.test,
              "-ranker", str(args.ranker), "-metric2t", args.metric,
              *args.extra]

    ours = _run(ours_cli + common + ["-save", str(tmp / "ours.txt")])
    java = _run(java_cli + common + ["-save", str(tmp / "java.txt")])

    ok = True
    for which in ("training", "test"):
        a = _metric_from_output(ours, which)
        b = _metric_from_output(java, which)
        status = "OK" if abs(a - b) <= TOL_METRIC else "DIVERGED"
        ok &= status == "OK"
        print(f"{args.metric} on {which}: ours={a:.4f} java={b:.4f} "
              f"Δ={abs(a - b):.4f} [{status}]")

    # cross-load BOTH directions: each side's model scored by both CLIs
    for model, tag in (("java.txt", "java model"), ("ours.txt", "our model")):
        s_ours = _scores(ours_cli, str(tmp / model), args.test,
                         str(tmp / f"o_{model}"))
        s_java = _scores(java_cli, str(tmp / model), args.test,
                         str(tmp / f"j_{model}"))
        worst = max((abs(a - b) for a, b in zip(s_ours, s_java)),
                    default=0.0)
        status = "OK" if worst <= TOL_SCORE else "DIVERGED"
        ok &= status == "OK"
        print(f"cross-load ({tag}, ours vs java scores): "
              f"max |Δ|={worst:.2e} [{status}]")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
