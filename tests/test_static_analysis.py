"""Static-analysis gate (the reference ships clang-format + CodeQL CI;
.github/workflows/clang-format.yml, codeql-analysis.yml).

This environment has no linters installed, so the gate is self-contained:
every Python source must byte-compile, and the native translation units
must compile warning-free under -Wall -Wextra.  Style configs for richer
environments live in .clang-format and pyproject.toml [tool.ruff].
"""

import os
import py_compile
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _py_sources():
    out = []
    for base in ("sperr_tpu", "tests", "examples", "."):
        d = os.path.join(ROOT, base)
        if base == ".":
            out += [
                os.path.join(d, f)
                for f in os.listdir(d)
                if f.endswith(".py")
            ]
            continue
        for dirpath, dirnames, filenames in os.walk(d):
            dirnames[:] = [x for x in dirnames if x != "__pycache__"]
            out += [
                os.path.join(dirpath, f)
                for f in filenames
                if f.endswith(".py")
            ]
    return sorted(set(out))


def test_all_python_sources_compile():
    for f in _py_sources():
        py_compile.compile(f, doraise=True)


@pytest.mark.parametrize("tu", ["flt.cpp", "capi.cpp"])
def test_native_sources_warning_free(tu):
    src = os.path.join(ROOT, "sperr_tpu", "runtime", "native", tu)
    r = subprocess.run(
        ["g++", "-fsyntax-only", "-std=c++17", "-Wall", "-Wextra", src],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    assert "warning" not in r.stderr, r.stderr
