"""Local evidence for the rows-only (oracle-less) approximate L/X ops:
LSH and SimHash outputs are engine-specific, so the driver only
row-counts them — these tests pin their SEMANTIC correctness."""

from __future__ import annotations

import duckdb
import pytest

from s3_avro_repair_spark.operators.text_quality import simhash64
from s3_avro_repair_spark.plans.registry import load_all

_OPS = load_all()


def hamming(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_simhash_planted_near_dup():
    """One substituted token out of 40 moves few SimHash bits; a
    disjoint vocabulary moves ~half of them."""
    base = [f"tok{i}" for i in range(40)]
    near = list(base)
    near[7] = "changed"
    far = [f"other{i}" for i in range(40)]
    h0, h1, h2 = simhash64(base), simhash64(near), simhash64(far)
    assert h0 == simhash64(list(base))  # deterministic
    assert hamming(h0, h1) <= 10
    assert hamming(h0, h2) >= 20


def _shingles(text: str) -> set[str]:
    toks = text.split(" ")
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def test_dedup_near_pairs_are_really_similar(spark, sf_dir):
    """Every pair MinHash-LSH reports at threshold 0.5 must have TRUE
    shingle Jaccard well above noise (no hallucinated pairs), checked
    against exact shingle sets recomputed from the parquet."""
    pairs = _OPS["dedup_near"].fn(spark, sf_dir).toPandas()
    docs = duckdb.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf()
    text_by_id = dict(zip(docs.doc_id, docs.text))
    for row in pairs.itertuples():
        a, b = _shingles(text_by_id[row.id_a]), _shingles(text_by_id[row.id_b])
        jac = len(a & b) / len(a | b)
        # approxSimilarityJoin's distCol is the EXACT jaccard distance
        # of the hashed shingle sets; allow hashing-collision slack.
        assert jac >= 0.4, (row.id_a, row.id_b, jac)
        assert abs((1 - jac) - (1 - row.jaccard_sim)) < 0.1


def test_ann_lsh_distances_are_exact_and_bounded(spark, sf_dir):
    """approxSimilarityJoin post-filters candidates with the exact
    metric, so every reported distance must satisfy the threshold and
    match a numpy recomputation."""
    import numpy as np

    out = _OPS["sim_ann_lsh"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    emb = duckdb.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchdf()
    vecs = {r.vec_id: np.asarray(r.embedding, dtype="float64") for r in emb.itertuples()}
    for row in out.sample(min(len(out), 50), random_state=0).itertuples():
        true = float(np.linalg.norm(vecs[row.query_id] - vecs[row.neighbor_id]))
        assert row.euclid_dist <= 3.0
        assert true == pytest.approx(row.euclid_dist, abs=1e-3)


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    """IVF with nprobe=1 is approximate: its top-5 per query must still
    overlap the exact brute-force top-5 substantially (the query's own
    cell holds its nearest vectors for clustered data), and every
    reported neighbor must share the query's cell by construction."""
    import numpy as np

    out = _OPS["sim_ann_ivf"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    emb = duckdb.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchdf()
    ids = emb.vec_id.to_numpy()
    mat = np.stack([np.asarray(e, dtype="float64") for e in emb.embedding])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    recalls = []
    for qid in out.query_id.unique():
        qv = mat[ids == qid][0]
        cos = mat @ qv
        order = sorted(
            [(c, i) for c, i in zip(cos, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )
        exact5 = {i for _, i in order[:5]}
        got = set(out[out.query_id == qid].neighbor_id)
        recalls.append(len(got & exact5) / 5)
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_knn_matches_bruteforce_numpy(spark, sf_dir):
    """sim_knn_topk's ranks must equal an independent numpy brute-force."""
    import numpy as np

    out = _OPS["sim_knn_topk"].fn(spark, sf_dir).toPandas()
    emb = duckdb.execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchdf()
    ids = emb.vec_id.to_numpy()
    mat = np.stack([np.asarray(e, dtype="float64") for e in emb.embedding])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in ids[ids % 100 == 0]:
        qv = mat[ids == qid][0]
        cos = mat @ qv
        order = sorted(
            [(c, i) for c, i in zip(cos, ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )
        expect = [i for _, i in order[:5]]
        got = out[out.query_id == qid].sort_values("rank").neighbor_id.tolist()
        assert got == expect, (qid, got, expect)


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _corpus_with_boilerplate(draw):
    """Docs built from 8-token blocks: each doc gets private-vocabulary
    blocks (no accidental cross-doc segment collisions) plus, in a
    chosen subset, one shared boilerplate block at a block-aligned
    position — exactly one 8-token segment the vote should catch."""
    n_docs = draw(st.integers(min_value=2, max_value=6))
    bp_block = " ".join(f"bp_{j}" for j in range(8))
    docs = []
    for i in range(n_docs):
        n_blocks = draw(st.integers(min_value=1, max_value=5))
        has_bp = draw(st.booleans())
        bp_pos = draw(st.integers(min_value=0, max_value=n_blocks - 1))
        blocks = [
            " ".join(f"w{i}_{b}_{j}" for j in range(8))
            for b in range(n_blocks)
        ]
        if has_bp:
            blocks[bp_pos] = bp_block
        docs.append((i, blocks))
    return docs, bp_block


@settings(max_examples=5, deadline=None)
@given(case=_corpus_with_boilerplate())
def test_dedup_segments_removes_exactly_the_shared_blocks(case, tmp_path_factory):
    """Property: dedup_segments removes a segment iff it occurs in >=2
    distinct documents — here, the injected boilerplate block when at
    least two docs carry it, and never the private-vocabulary blocks."""
    import pandas as pd

    from s3_avro_repair_spark.plans.registry import load_all
    from s3_avro_repair_spark.session import get_session

    docs, bp_block = case
    spark = get_session("pytest", master="local[8]", shuffle_partitions=8)
    tmp = tmp_path_factory.mktemp("segprop")
    rows = []
    for doc_id, blocks in docs:
        text = " ".join(blocks)
        rows.append(
            {
                "doc_id": doc_id,
                "text": text,
                "lang": "en",
                "source": "prop",
                "n_chars": len(text),
            }
        )
    pd.DataFrame(rows).to_parquet(str(tmp / "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in load_all()["dedup_segments"].fn(spark, str(tmp)).collect()
    }
    n_bp_docs = sum(1 for _, blocks in docs if bp_block in blocks)
    for doc_id, blocks in docs:
        got = out[doc_id]
        assert got["n_seg"] == len(blocks)
        if n_bp_docs >= 2 and bp_block in blocks:
            expect_removed = sum(1 for b in blocks if b == bp_block)
            expect_clean = " ".join(b for b in blocks if b != bp_block)
        else:
            expect_removed = 0
            expect_clean = " ".join(blocks)
        assert got["n_removed"] == expect_removed, (doc_id, dict(got.asDict()))
        assert got["clean_text"] == expect_clean, (doc_id, dict(got.asDict()))
