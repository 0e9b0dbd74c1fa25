"""Law tests for the shared URL canonicalizer (_shared_exprs, r12):
equivalence-class invariance and idempotence, over a generated grid of
messy variants — tests-only hardening beyond the fixture-derived oracle
parity (which only exercises the four derivation branches)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from flink_stream_processing_spark.queries_impl._shared_exprs import (
    canonical_url_col,
)


def _variants(host_core: str, path: str, qparams: list[str]) -> list[str]:
    """Messy variants that must all canonicalize identically."""
    schemes = ["https://", "HTTPS://", "http://"]
    hosts = [host_core, "www." + host_core, host_core.upper()]
    ports = ["", ":443", ":80"]
    tails = ["", "/", "/index.html"]
    frags = ["", "#frag", "#a/b?c"]
    utms = [[], ["utm_source=x"], ["utm_campaign=y", "utm_medium=z"]]
    out = []
    for s, h, p, t, f_, u in itertools.product(
        schemes, hosts, ports, tails, frags, utms
    ):
        qs = qparams + u
        q = ("?" + "&".join(qs)) if qs else ""
        out.append(f"{s}{h}{p}{path}{t}{q}{f_}")
    return out


def test_equivalence_classes_collapse_and_canon_is_idempotent(spark):
    classes = {
        "c1": ("ex.example.com", "/en/page1", ["id=1"]),
        "c2": ("ex.example.com", "/en/page1", []),      # no query: distinct from c1
        "c3": ("ex.example.com", "/en/page2", ["id=1"]),
        "c4": ("other.example.org", "/en/page1", ["id=1"]),
        "c5": ("ex.example.com", "/en/page1", ["b=2", "a=1"]),  # param order
    }
    rows = []
    for key, (h, p, q) in classes.items():
        for v in _variants(h, p, q):
            rows.append((key, v))
        if key == "c5":  # the other param order joins the same class
            for v in _variants(h, p, ["a=1", "b=2"]):
                rows.append((key, v))
    df = spark.createDataFrame(rows, "cls string, url string")
    out = df.select(
        "cls",
        canonical_url_col(F.col("url")).alias("canon"),
        canonical_url_col(canonical_url_col(F.col("url"))).alias("canon2"),
    ).collect()
    by_cls: dict[str, set[str]] = {}
    for r in out:
        by_cls.setdefault(r["cls"], set()).add(r["canon"])
        assert r["canon2"] == r["canon"], f"not idempotent: {r}"
    for cls, canons in by_cls.items():
        assert len(canons) == 1, f"{cls} split into {canons}"
    # distinct classes stay distinct
    all_canons = {next(iter(v)) for v in by_cls.values()}
    assert len(all_canons) == len(classes)
    # shape law: https scheme, no www, no default port, no fragment/utm residue
    for c in all_canons:
        assert c.startswith("https://") and "www." not in c
        assert ":80" not in c and ":443" not in c
        assert "#" not in c and "utm_" not in c and "index.html" not in c
