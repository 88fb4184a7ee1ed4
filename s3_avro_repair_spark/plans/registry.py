"""Operator registry — the single source of truth for the driver contract.

Every operator from SURVEY.md §2B registers itself here with
(a) a query callable ``(spark, sf_dir) -> DataFrame`` and
(b) an optional ANSI-SQL oracle string runnable by DuckDB on the same
parquet fixtures. ``__spark_entry__.py`` exposes this registry as
``queries()`` / ``oracle_sql()``.

Column-name discipline: the driver's compare sorts columns by name
before hashing values, so every computed column must carry the SAME
alias in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import importlib
import inspect
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..session import tune_for_oracle

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Op:
    name: str
    group: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = field(default="", compare=False)
    # md5 over (query-fn source, oracle text) — see fingerprint().
    src_hash: str = field(default="", compare=False)
    fingerprint: str = field(default="", compare=False)


_REGISTRY: dict[str, Op] = {}

# Modules that register ops on import (one per SURVEY.md §2B group).
#
# ORDER MATTERS for driver attestation: the correctness driver hashes the
# FIRST 50 registered keys each round, so the front of this list is the
# round's attestation window. Rotation log:
#   r1+r2 attested: P / J / G / W / O / F (projections, joins, aggregations,
#                   windows, sorts, scalar fns).
#   r3 window: E (avro_pipeline, 14) + L (llm 13, multimodal 6,
#                   llm_pipeline 7) + top of S (scans) = exactly the 50
#                   never-attested E/L/S keys.
#   r4 window (this order): Q composite (24) + T stream_ops (11) + U udfs (7)
#                   + P subqueries (5) + C graph (3) = exactly the 50
#                   never-attested Q/T/U/P/C keys. Cumulative after r4: 159/227.
#   r5+: AUTOMATIC — load_all() reads the committed CORRECTNESS_r*.json
#                   files and orders never-attested keys first, so each
#                   round's window is the next 50 unattested keys with no
#                   manual module rotation (module rotation could not
#                   subdivide mixed-attestation modules anyway: after r4
#                   the 68 remaining keys spread across 9 modules, 6 of
#                   them partially attested).
_OP_MODULES = [
    "s3_avro_repair_spark.operators.composite",     # Q (composite queries)
    "s3_avro_repair_spark.streaming.stream_ops",    # T
    "s3_avro_repair_spark.operators.udfs",          # U
    "s3_avro_repair_spark.operators.subqueries",    # P (subquery surface)
    "s3_avro_repair_spark.operators.graph",         # C (graph analytics)
    "s3_avro_repair_spark.sources.avro_pipeline",   # E
    "s3_avro_repair_spark.operators.llm",           # L
    "s3_avro_repair_spark.operators.multimodal",    # L (multimodal)
    "s3_avro_repair_spark.operators.llm_pipeline",  # L (corpus management)
    "s3_avro_repair_spark.sources.scans",           # S
    "s3_avro_repair_spark.operators.text_quality",  # X (extra text ops)
    "s3_avro_repair_spark.operators.extras",        # X (scale patterns)
    "s3_avro_repair_spark.operators.lifecycle",     # C (CDC / data lifecycle)
    "s3_avro_repair_spark.operators.projections",   # P
    "s3_avro_repair_spark.operators.joins",         # J
    "s3_avro_repair_spark.operators.aggregations",  # G
    "s3_avro_repair_spark.operators.windows",       # W
    "s3_avro_repair_spark.operators.sorts",         # O
    "s3_avro_repair_spark.functions.scalar",        # F
    # LAST on purpose: companion-bound keys are never-attested at
    # introduction (r6) and must sort BEHIND the F/O/W keys still
    # waiting for their first attestation window.
    "s3_avro_repair_spark.operators.companions",    # G/L/S/X companions
    # LAST+1: the r6 extension ops are never-attested too and must
    # sort behind the companions — together they fill the r6 window's
    # spare slots (38 critical keys + 10 extensions + 2 buffer).
    "s3_avro_repair_spark.operators.extensions",    # X (r6 pipeline ops)
    # LAST+2: r9 curation ops (bigram LM, temperature resample, pHash)
    # — never-attested at introduction, behind everything prior.
    "s3_avro_repair_spark.operators.curation",      # X (r9 curation ops)
    # LAST+3: the Python DataSource packaging of the OCF codec.
    "s3_avro_repair_spark.sources.avro_datasource", # E (DataSource V2)
]

_loaded = False


def register(name: str, group: str, oracle: str | Callable[[], str] | None = None):
    """Decorator: register a query fn under an op key.

    The registered callable is wrapped so that ``tune_for_oracle`` runs
    first: the driver invokes queries with ITS OWN SparkSession, and the
    oracles for timestamp-casting ops (fn_date, join_asof, …) depend on
    UTC session time and the nanos-parquet read conf. Wrapping here
    guarantees determinism without each op remembering to call it.

    ``oracle`` may be a zero-arg callable resolved lazily in
    ``load_all()``: an oracle builder that imports ANOTHER op module
    (e.g. stream_avro_salvage's, which reads avro_pipeline's expected
    corruption layout) must not run at decoration time, or the
    imported module's ops would register mid-window and corrupt the
    driver's first-50 attestation rotation.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate op key: {name}")

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_oracle(spark)
            return fn(spark, sf_dir)

        # Source hash captured from the UNDECORATED fn at registration
        # (getsource on the wrapper would read this file, not the op).
        # Combined with the resolved oracle text into Op.fingerprint by
        # load_all(); a key whose fingerprint drifted since its last
        # driver attestation floats back into the window (see
        # _stale_fingerprint_keys).
        try:
            src = inspect.getsource(fn)
        except (OSError, TypeError):
            src = fn.__qualname__
        _REGISTRY[name] = Op(
            name=name,
            group=group,
            fn=wrapped,
            oracle=oracle,
            doc=fn.__doc__ or "",
            src_hash=hashlib.md5(src.encode()).hexdigest(),
        )
        return fn

    return deco


def registered_oracle(name: str) -> str:
    """The already-registered oracle text of another op — for
    companion ops whose DuckDB oracle wraps a base op's oracle (the
    base module imports first, so its plain-string oracle is resolved).
    Callable (lazy) oracles aren't supported as bases: resolve order
    inside load_all() would matter."""
    op = _REGISTRY[name]
    if not isinstance(op.oracle, str):
        raise TypeError(f"oracle of {name} is not a resolved string")
    return op.oracle


def load_all() -> dict[str, Op]:
    """Import every op module (idempotent) and return the registry."""
    global _loaded
    if not _loaded:
        for mod in _OP_MODULES:
            importlib.import_module(mod)
        for name, op in list(_REGISTRY.items()):
            if callable(op.oracle):
                op = dataclasses.replace(op, oracle=op.oracle())
            _REGISTRY[name] = dataclasses.replace(
                op,
                fingerprint=hashlib.md5(
                    f"{op.src_hash}\n--oracle--\n{op.oracle or ''}".encode()
                ).hexdigest(),
            )
        attested = effective_attested_keys(_REGISTRY)
        position = {k: i for i, k in enumerate(_REGISTRY)}
        ordered = sorted(_REGISTRY, key=lambda n: (n in attested, position[n]))
        reordered = {n: _REGISTRY[n] for n in ordered}
        _REGISTRY.clear()
        _REGISTRY.update(reordered)
        _loaded = True
    return dict(_REGISTRY)


def effective_attested_keys(ops: dict[str, Op]) -> frozenset[str]:
    """Attested-for-ordering-purposes: the driver said green AND the
    op is still the thing the driver saw. A key whose (source, oracle)
    fingerprint drifted since its last recorded attestation floats
    back to the front of the rotation, so the next 50-key window
    re-checks the CURRENT semantics instead of trusting a record that
    attested different code (the r5 join_theta/fn_variant gap)."""
    return _attested_keys() - _stale_fingerprint_keys(ops)


def _stale_fingerprint_keys(ops: dict[str, Op]) -> frozenset[str]:
    """Keys whose current fingerprint differs from the one recorded at
    their last driver attestation (plans/fingerprints.json, refreshed
    at round start by tools/update_fingerprints.py BEFORE any edit —
    at that moment current source/oracle == what the driver just
    attested). A key missing from the file is stale too (green record
    but no known-good fingerprint). No file -> no floating: the
    mechanism degrades to the plain record-based rotation."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fingerprints.json")
    try:
        with open(path) as f:
            recorded = json.load(f)
    except (OSError, ValueError):
        return frozenset()
    if not isinstance(recorded, dict):
        return frozenset()
    return frozenset(
        k for k, op in ops.items() if recorded.get(k) != op.fingerprint
    )


def _attested_keys() -> frozenset[str]:
    """Op keys whose NEWEST record across the committed
    CORRECTNESS_r*.json driver files passed: err is None, or the
    by-design ``"no_oracle"`` rows-only marker. A key whose latest
    record errored (e.g. a canonicalizer crash) does NOT count — it
    floats back to the front of the registry so the next round's
    first-50 attestation window re-checks the fix. load_all() orders
    never-attested-green keys first; the rotation maintains itself as
    each round's record lands."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    latest: dict[str, tuple[int, object]] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else -1
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rec, dict):
            continue
        for k, v in rec.items():
            if isinstance(k, str) and (k not in latest or rnd > latest[k][0]):
                latest[k] = (rnd, v)
    ok: set[str] = set()
    for k, (_, v) in latest.items():
        err = v.get("err") if isinstance(v, dict) else None
        if err is None or err == "no_oracle":
            ok.add(k)
    return frozenset(ok)
