"""Query catalog: every operator claimed in SURVEY.md §2 has an entry here.

Each entry pairs a Spark implementation (``(spark, sf_dir) -> DataFrame``)
with an ANSI-SQL oracle string DuckDB can run on the same parquet tables.
The driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json) — so
column names/ordering must match exactly, and floating results must be
made deterministic (see queries.determinism notes).

Modules self-register via the @query decorator at import time.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver falls back to rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query implementation in the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, spark_fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "")
        )
        return fn

    return deco


# Catalog emission order: the driver evaluates queries() in dict order and
# samples a ~50-query prefix per round, so the prefix decides which
# queries get fresh correctness evidence.  Priority: (a) any query whose
# latest driver sample FAILED, (b) never-sampled queries (new entries
# land here automatically), (c) everything else oldest-evidence-first —
# each tier interleaved round-robin across operator families.  Evidence
# age is read from the repo's own CORRECTNESS_r*.json driver records at
# call time, so the ordering stays current without hand-kept lists.


def _driver_evidence() -> dict[str, tuple[int, bool]]:
    """name -> (latest sampled round, passed on that sample)."""
    import json
    import re as _re
    from pathlib import Path

    out: dict[str, tuple[int, bool]] = {}
    root = Path(__file__).resolve().parents[2]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"_r(\d+)", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, rec in rows.items():
            ok = bool(
                isinstance(rec, dict)
                and rec.get("rows_match")
                and rec.get("schema_match", True)
                and rec.get("hash_match", True)
                and not rec.get("err")
            )
            prev = out.get(name)
            if prev is None or rnd >= prev[0]:
                out[name] = (rnd, ok)
    return out
_FAMILY_ORDER = (
    "tpch",
    "agg",
    "window",
    "join",
    "fn",
    "rel",
    "setop",
    "subq",
    "events",
    "text",
    "dedup",
    "similarity",
    "multimodal",
)


def _family(name: str) -> str:
    head = name.split("_", 1)[0]
    if head in {"tpch", "agg", "window", "join", "fn", "setop", "events", "text",
                "dedup", "similarity", "multimodal"}:
        return head
    if head in {"subquery", "cte", "lateral"}:
        return "subq"
    return "rel"  # values/unnest/sample/orderby/distinct/assign/types/conditional/pivot


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY); return the
    catalog interleaved round-robin across operator families."""
    from prestodb_presto_spark.queries import (  # noqa: F401
        aggregates,
        functions_q,
        joins,
        mixing,
        multimodal_q,
        packing,
        relational,
        setops,
        similarity_q,
        streaming_batch,
        textops,
        tpch,
        windows_q,
    )

    def round_robin(names: list[str]) -> list[str]:
        buckets: dict[str, list[str]] = {fam: [] for fam in _FAMILY_ORDER}
        for name in names:
            buckets[_family(name)].append(name)
        out: list[str] = []
        rank = 0
        while len(out) < len(names):
            for fam in _FAMILY_ORDER:
                if rank < len(buckets[fam]):
                    out.append(buckets[fam][rank])
            rank += 1
        return out

    evidence = _driver_evidence()
    failed = [n for n in REGISTRY if n in evidence and not evidence[n][1]]
    unsampled = [n for n in REGISTRY if n not in evidence]
    sampled = [n for n in REGISTRY if n in evidence and evidence[n][1]]
    # oldest evidence first; round-robin across families within a round
    by_round: dict[int, list[str]] = {}
    for n in sampled:
        by_round.setdefault(evidence[n][0], []).append(n)
    aged: list[str] = []
    for rnd in sorted(by_round):
        aged.extend(round_robin(by_round[rnd]))
    ordered = round_robin(failed) + round_robin(unsampled) + aged
    return {n: REGISTRY[n] for n in ordered}
