"""AST syntax gate over every project .py file (reference test_syntax.py)."""

import ast
import pathlib

ROOT = pathlib.Path(__file__).parent.parent


def test_all_python_files_parse():
    failures = []
    for sub in ("spectral_tpu", "scripts", "tests", "examples", "benchmarks"):
        for path in (ROOT / sub).rglob("*.py"):
            try:
                ast.parse(path.read_text())
            except SyntaxError as e:
                failures.append(f"{path}: {e}")
    for single in ("bench.py", "__graft_entry__.py"):
        p = ROOT / single
        if p.exists():
            try:
                ast.parse(p.read_text())
            except SyntaxError as e:
                failures.append(f"{p}: {e}")
    assert not failures, "\n".join(failures)
