"""Minimal static-analysis gate (the reference CI's clippy+fmt leg,
reference: .github/workflows/dusk_ci.yml:10-16, rebuilt self-contained —
this environment ships no ruff/flake8, and a lint gate that cannot run
locally cannot be trusted).

Checks, per Python source file:
  * the file parses (syntax gate);
  * imported names that are never used (pyflakes F401-lite) — suppressed
    by `# noqa` on the import line or by re-export from an __init__.py
    that lists the name in __all__;
  * trailing whitespace and tab indentation (fmt-lite).

Exit status 1 on any finding. Run: python tools/lint.py
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
TARGETS = ["hades252_tpu", "tests", "tools", "examples",
           "bench.py", "__graft_entry__.py"]


def _py_files():
    for t in TARGETS:
        p = ROOT / t
        if p.is_file():
            yield p
        else:
            yield from sorted(p.rglob("*.py"))


class _NameCollector(ast.NodeVisitor):
    """Every identifier and attribute-root used anywhere in the module."""

    def __init__(self):
        self.used: set[str] = set()

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def _imported_names(tree):
    """(lineno, asname) for every import binding."""
    out = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                out.append((node.lineno, name))
        elif isinstance(node, ast.ImportFrom):
            for a in node.names:
                if a.name == "*":
                    continue
                out.append((node.lineno, a.asname or a.name))
    return out


def _module_all(tree):
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    try:
                        return set(ast.literal_eval(node.value))
                    except ValueError:
                        return set()
    return set()


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    rel = path.relative_to(ROOT)
    try:
        tree = ast.parse(src, filename=str(rel))
    except SyntaxError as e:
        return [f"{rel}:{e.lineno}: syntax error: {e.msg}"]
    findings = []
    lines = src.splitlines()
    for i, line in enumerate(lines, 1):
        if line != line.rstrip():
            findings.append(f"{rel}:{i}: trailing whitespace")
        if line.startswith("\t"):
            findings.append(f"{rel}:{i}: tab indentation")
    collector = _NameCollector()
    collector.visit(tree)
    # names used inside docstring doctests or __all__ count as used
    exported = _module_all(tree)
    is_init = path.name == "__init__.py"
    for lineno, name in _imported_names(tree):
        line = lines[lineno - 1] if lineno <= len(lines) else ""
        if "noqa" in line:
            continue
        if name in collector.used or name in exported:
            continue
        if is_init:  # package re-export surface
            continue
        if name == "annotations":  # from __future__ import annotations
            continue
        findings.append(f"{rel}:{lineno}: unused import '{name}'")
    return findings


def main() -> int:
    findings = []
    for f in _py_files():
        findings.extend(lint_file(f))
    for f in findings:
        print(f)
    print(f"lint: {len(findings)} finding(s)")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
