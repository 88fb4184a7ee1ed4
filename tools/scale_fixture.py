"""Synthesize a 10x ("sf1.0") fixture from sf0.1 by keyed union
replication — the SCALING.md measurement harness (round-5 verdict task:
convert the single-row-group-floor analysis from argument to measured
wall-time-vs-sf datapoints, with no plan changes).

Each table is replicated COPIES times; copy i offsets every key column
by i * stride(key domain) with stride = max(key) + 1, so referential
integrity holds within each copy (customer->nation->region, lineitem->
orders/part/supplier, etc.) and cardinalities scale linearly.
documents.text gets a per-copy suffix token (and n_chars follows):
10 EXACT copies of every document would be a duplication pathology —
every dedup cluster inflated 10x regardless of corpus content — not a
scaled corpus; distinct texts keep the near-dup rate representative.

Usage: python tools/scale_fixture.py [src_sf_dir] [out_dir] [copies]
Defaults: /root/testdata/sf0.1 -> <repo>/.avro_cache/scaled_sf1.0, 10.
"""

from __future__ import annotations

import os
import sys

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# key column -> (table that owns the domain, owning column); stride is
# computed once per domain and applied to every referencing column.
KEY_DOMAINS = {
    "regionkey": ("region", "r_regionkey"),
    "nationkey": ("nation", "n_nationkey"),
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def _src(sf_dir: str, t: str) -> str:
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def _domain_of(col: str) -> str | None:
    for dom in KEY_DOMAINS:
        if col.endswith(dom):
            return dom
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(_REPO, ".avro_cache", "scaled_sf1.0")
    )
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out_dir, exist_ok=True)

    con = duckdb.connect()
    strides: dict[str, int] = {}
    for dom, (t, col) in KEY_DOMAINS.items():
        strides[dom] = (
            con.execute(
                f"SELECT COALESCE(MAX({col}), 0) + 1 "
                f"FROM read_parquet('{_src(sf_dir, t)}')"
            ).fetchone()[0]
        )

    for t in TABLES:
        described = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{_src(sf_dir, t)}')"
        ).fetchall()
        cols = [r[0] for r in described]
        dtypes = {r[0]: r[1] for r in described}
        selects = []
        for i in range(copies):
            exprs = []
            for c in cols:
                dom = _domain_of(c)
                if dom is not None and i > 0:
                    # preserve the column's read dtype (INTEGER nation/
                    # region keys stay INTEGER, BIGINTs stay BIGINT)
                    exprs.append(
                        f"CAST({c} + {i * strides[dom]} AS {dtypes[c]}) AS {c}"
                    )
                elif t == "documents" and c == "text" and i > 0:
                    exprs.append(f"text || ' cp{i}' AS text")
                elif t == "documents" and c == "n_chars" and i > 0:
                    exprs.append(f"n_chars + {len(f' cp{i}')} AS n_chars")
                else:
                    exprs.append(c)
            selects.append(
                "SELECT "
                + ", ".join(exprs)
                + f" FROM read_parquet('{_src(sf_dir, t)}')"
            )
        sql = " UNION ALL ".join(selects)
        out = os.path.join(out_dir, f"{t}.parquet")
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{t}: {n} rows -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
