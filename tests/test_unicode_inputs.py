"""Unicode-corpus sweep: the text-op family must stay ORACLE-EXACT (not
just crash-free) when documents carry CJK, emoji + ZWJ sequences,
combining marks (NFD vs NFC kept distinct — no silent normalization),
RTL scripts, astral-plane (4-byte UTF-8) letters, and ideographic
spaces. Real training corpora are mostly this, not ASCII.

Probed engine-level primitive parity (Spark 4.1 JVM vs DuckDB
utf8proc) before designing the fixture: lower/upper/length/substr/md5/
split agree on every class above. The two KNOWN divergences — kept OUT
of the fixture because they test the engines' Unicode tables, not our
operators — are full-vs-simple case mapping edges:
  lower('İ')  Spark 'i̇' (i + combining dot)  DuckDB 'i'
  upper('ß')  Spark 'SS'                            DuckDB 'ẞ'
(lower-case 'ß' itself is stable and IS in the fixture).
"""

from __future__ import annotations

import duckdb
import pytest

from s3_avro_repair_spark.plans.registry import load_all

from tools.verify_local import TABLES, compare

_OPS = load_all()

# (text, lang, source): langs/sources extend the fixture domain — new
# strata are legal input and must flow through stratified ops unharmed.
_UNICODE_DOCS = [
    ("深度 学习 模型 的 训练 数据 质量 决定 最终 效果 深度 学习", "zh", "src0"),
    ("🚀 rocket 👩‍💻 coder 🇯🇵 flags and more emoji 🚀 rocket 🚀", "en", "src1"),
    ("café résumé naïve decomposed combining marks here", "fr", "src2"),
    ("café résumé naïve precomposed accented words here too", "fr", "src2"),
    ("تعلم الآلة يغير العالم بسرعة كبيرة جدا هذه الأيام حقا", "ar", "src3"),
    ("למידת מכונה משנה את העולם במהירות רבה מאוד כעת", "he", "src3"),
    ("𝕳𝖊𝖑𝖑𝖔 𝖜𝖔𝖗𝖑𝖉 mathematical fraktur 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 astral letters", "en", "src4"),
    ("die straße ist groß und weiß gefärbt heute", "de", "src5"),
    ("日本語　テスト　データ", "ja", "src6"),  # U+3000 only: 1 token
    # exact duplicate of the CJK doc under a fresh id: unicode dedup
    ("深度 学习 模型 的 训练 数据 质量 决定 最终 效果 深度 学习", "zh", "src0"),
]


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory, sf_dir) -> str:
    tmp = tmp_path_factory.mktemp("sf_unicode")
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet'))"
            f" TO '{tmp}/{t}.parquet' (FORMAT PARQUET)"
        )
    rows = " UNION ALL ".join(
        f"SELECT CAST({9000 + i} AS BIGINT) AS doc_id, "
        f"'{text}' AS text, '{lang}' AS lang, '{source}' AS source, "
        f"CAST({len(text)} AS BIGINT) AS n_chars"
        for i, (text, lang, source) in enumerate(_UNICODE_DOCS)
    )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
        f" UNION ALL BY NAME ({rows}))"
        f" TO '{tmp}/documents.parquet' (FORMAT PARQUET)"
    )
    con.close()
    return str(tmp)


@pytest.fixture(scope="module")
def unicode_duck(unicode_sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM read_parquet('{unicode_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


# Every oracle-paired op whose plan touches documents.text: the parity
# gate, not just crash-survival. sink_avro additionally round-trips the
# text through the hand-written OCF codec's utf-8 encode/decode, and
# scan_jsonl through the JSONL rendition + Spark's JSON reader.
_TEXT_PARITY_OPS = [
    "text_tokenize", "text_ngrams", "text_stats", "text_tfidf",
    "text_collocation", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_segments", "text_lang_id", "text_quality",
    "text_token_count", "text_fingerprint", "text_normalize",
    "text_pii_mask", "text_entropy", "text_repetition",
    "dedup_levenshtein", "decontaminate", "split_train_test",
    "sample_stratified", "pack_sequences", "corpus_mixture",
    "corpus_token_buckets", "corpus_dedup_report", "sink_avro",
    "scan_jsonl", "q_corpus_curation", "q_corpus_pipeline",
]


def test_parity_list_is_oracled():
    missing = [n for n in _TEXT_PARITY_OPS if n not in _OPS]
    assert not missing, missing
    no_oracle = [n for n in _TEXT_PARITY_OPS if _OPS[n].oracle is None]
    assert not no_oracle, no_oracle


@pytest.mark.parametrize("name", _TEXT_PARITY_OPS)
def test_text_op_unicode_parity(name, spark, unicode_sf_dir, unicode_duck):
    op = _OPS[name]
    sdf = op.fn(spark, unicode_sf_dir).toPandas()
    ddf = unicode_duck.execute(op.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_unicode_dedup_exact_finds_the_pair(spark, unicode_sf_dir):
    """The two byte-identical CJK docs (9000, 9009) must land in one
    duplicate group; the NFD/NFC pair (9002, 9003) must NOT — exact
    dedup is byte-level, normalization is a separate explicit step."""
    out = _OPS["dedup_exact"].fn(spark, unicode_sf_dir).toPandas()
    keep = set(out["keep_id"])
    dup_group = out[out["keep_id"] == 9000]
    assert len(dup_group) == 1 and int(dup_group["n_copies"].iloc[0]) == 2
    assert 9009 not in keep
    assert {9002, 9003} <= keep
