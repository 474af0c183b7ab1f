"""RankLib-style console logging.

The reference prints per-round progress tables from Ranker.printLogLn
(ref: learning/Ranker.java:~200) and suppresses them under ``-silent``.
We reproduce the console contract (tests and downstream tooling key off the
table shape) and additionally emit structured JSONL events when
``set_event_log`` is given a path (an observability upgrade the reference
lacks, SURVEY.md §5).
"""

from __future__ import annotations

import json
import sys
import time

_SILENT = False
_EVENT_FP = None


def set_silent(silent: bool) -> None:
    global _SILENT
    _SILENT = bool(silent)


def is_silent() -> bool:
    return _SILENT


def set_event_log(path: str | None) -> None:
    """Enable structured JSONL event logging to *path* (None disables)."""
    global _EVENT_FP
    if _EVENT_FP is not None:
        _EVENT_FP.close()
        _EVENT_FP = None
    if path:
        _EVENT_FP = open(path, "a", buffering=1)


def log(msg: str = "") -> None:
    """Print a progress line unless silenced (ref: Ranker.printLogLn)."""
    if not _SILENT:
        print(msg, file=sys.stdout, flush=True)


def result(msg: str = "") -> None:
    """Print a FINAL-RESULT line regardless of ``-silent``.

    The reference's -silent only mutes per-round progress
    (Ranker.verbose); final metric summaries print via System.out
    unconditionally (ref: eval/Evaluator.java evaluate() tail). Gating
    them behind log() made ``-silent -test`` exit 0 with zero bytes of
    output — the result was simply lost (review finding, round 5)."""
    print(msg, file=sys.stdout, flush=True)


def event(kind: str, **fields) -> None:
    """Emit a structured event to the JSONL log (no-op when disabled)."""
    if _EVENT_FP is not None:
        rec = {"t": time.time(), "event": kind}
        rec.update(fields)
        _EVENT_FP.write(json.dumps(rec) + "\n")


class PhaseTimer:
    """Wall-clock phase timer; the reference's only profiling is the train
    wall-clock printed by RankerTrainer (ref: learning/RankerTrainer.java:~50)."""

    def __init__(self, name: str):
        self.name = name
        self.t0 = None
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        event("phase", name=self.name, seconds=self.elapsed)
        return False
