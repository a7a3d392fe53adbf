"""Coverage gate mirroring the reference's codecov policy (target 90%,
threshold 5% -> fail under 85%; reference: codecov.yml:12-16).

No coverage.py in this environment, so this uses CPython 3.12's
sys.monitoring: a global LINE event whose callback records the hit and
returns DISABLE, so every (code, line) location fires exactly once ever —
near-zero steady-state overhead on a 1-core host. Executable lines come
from compiling each package file and walking the code objects' co_lines().

Usage: python tools/coverage_gate.py [min_pct]
Runs the test suite in-process and prints per-file + total line coverage
for hades252_tpu/.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "hades252_tpu")
if REPO not in sys.path:
    sys.path.insert(0, REPO)

#: Excluded from the gate, with reasons:
#:   multihost.py — exercised only by the real two-process test, which is
#:   skipped by default on this 1-core host (tests/test_multihost.py
#:   passes standalone under RUN_MULTIHOST=1);
#:   profiling.py jax.profiler wrapper — needs a live TPU trace session.
EXCLUDE = {"parallel/multihost.py"}

_executed: dict[str, set[int]] = {}


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(PKG):
        _executed.setdefault(fn, set()).add(line)
    return sys.monitoring.DISABLE


def _executable_lines(path: str) -> set[int]:
    with open(path) as f:
        src = f.read()
    lines: set[int] = set()
    stack = [compile(src, path, "exec")]
    while stack:
        code = stack.pop()
        for _, _, ln in code.co_lines():
            if ln is not None:
                lines.add(ln)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    # module docstring/constant assignment lines compile to line events too;
    # keep them — they execute at import and are covered by any import.
    return lines


def main() -> int:
    min_pct = float(sys.argv[1]) if len(sys.argv) > 1 else 85.0

    mon = sys.monitoring
    tool = mon.COVERAGE_ID
    mon.use_tool_id(tool, "hades-coverage-gate")
    mon.register_callback(tool, mon.events.LINE, _on_line)
    mon.set_events(tool, mon.events.LINE)

    import pytest

    rc = pytest.main(
        ["-q", os.path.join(REPO, "tests"),
         "--ignore", os.path.join(REPO, "tests", "test_examples.py")]
    )
    mon.set_events(tool, 0)
    if rc != 0:
        print("coverage gate: test suite failed, refusing to report")
        return int(rc)

    total_exec = total_hit = 0
    rows = []
    for root, _, files in os.walk(PKG):
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            rel = os.path.relpath(path, PKG)
            if rel in EXCLUDE:
                continue
            executable = _executable_lines(path)
            hit = _executed.get(path, set()) & executable
            total_exec += len(executable)
            total_hit += len(hit)
            pct = 100.0 * len(hit) / len(executable) if executable else 100.0
            rows.append((rel, len(hit), len(executable), pct))

    for rel, h, e, pct in rows:
        print(f"{rel:40s} {h:5d}/{e:<5d} {pct:6.1f}%")
    pct = 100.0 * total_hit / total_exec if total_exec else 100.0
    print(f"{'TOTAL':40s} {total_hit:5d}/{total_exec:<5d} {pct:6.1f}%")
    if pct < min_pct:
        print(f"coverage gate FAILED: {pct:.1f}% < {min_pct}%")
        return 1
    print(f"coverage gate passed: {pct:.1f}% >= {min_pct}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
