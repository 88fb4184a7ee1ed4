"""L group (multimodal) — opaque-binary column handling.

Real multimodal pipelines carry image/audio/video as ``binary`` columns
with typed metadata and decode/resize/frame-sample inside Arrow-batched
Python (the only sane place for codec libraries on a cluster). The
image/audio libraries are not in this container, so the DECODE step is
a deterministic stand-in (hash/length features) — but every Spark-side
piece is real and oracle-checked: binary column schema, mapInPandas
batch iteration, frame-window arithmetic, struct packing, join layout.
A production decoder swaps one pandas function, nothing else moves.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..tables import table


@register(
    "multimodal_join",
    group="L",
    oracle="""
    SELECT d.doc_id, d.lang, d.n_chars, e.label,
           len(e.embedding) AS dim
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text ⋈ embedding modality join with struct packing: the payload
    travels as one struct column (the layout multimodal training rows
    use), flattened for the hash compare. Equi-join on the shared id —
    plain shuffled hash join, or exchange-free if both modalities were
    written bucketed by id (sources/scans.py::sink_bucketed)."""
    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    packed = d.join(e, d.doc_id == e.vec_id).select(
        F.struct(
            F.col("doc_id"),
            F.col("lang"),
            F.col("n_chars"),
            F.col("label"),
            F.size("embedding").alias("dim"),
        ).alias("sample")
    )
    return packed.select("sample.*")


@register(
    "mm_decode",
    group="L",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-modality decode plumbing: text bytes stand in for an
    encoded image/audio blob (fixtures ship no real media). The blob
    column is genuine ``binary``; feature extraction runs in
    mapInPandas over Arrow batches — the exact shape a real decoder
    (PIL/librosa/ffmpeg) plugs into. The stand-in features (byte
    length, md5) are deterministic, so this plumbing IS hash-checked
    against SQL on both engines."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )

    def decode(batches):
        # NULL blob = missing media: the row survives with NULL
        # features, matching the oracle's NULL propagation.
        for pdf in batches:
            blobs = list(pdf["blob"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(
                        [None if b is None else len(b) for b in blobs],
                        dtype="Int64",
                    ),
                    "content_md5": [
                        None
                        if b is None
                        else hashlib.md5(bytes(b)).hexdigest()
                        for b in blobs
                    ],
                }
            )

    return d.mapInPandas(
        decode, schema="doc_id long, n_bytes long, content_md5 string"
    )


@register(
    "mm_frame_sample",
    group="L",
    oracle="""
    SELECT doc_id, i AS frame_no,
           md5(substring(hex(encode(text)), 1 + i * 16, 16)) AS frame_md5
    FROM documents, generate_series(0, 2) AS g(i)
    WHERE length(hex(encode(text))) >= (i + 1) * 16
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing for a video-like blob: cut fixed-stride
    windows ("frames") out of the byte stream inside mapInPandas and
    fingerprint each. One input row fans out to N frame rows — the
    iterator-of-batches contract handles the fan-out without
    materializing a partition. The stand-in blob is the HEX rendition
    of the text bytes — pure ASCII by construction, so the kernel's
    BYTE offsets equal the oracle's char offsets on ANY corpus (the
    production-shard sweep's unicode documents broke the old
    raw-UTF-8 stand-in: a 16-byte frame can split a codepoint, which
    no VARCHAR oracle can hash). A real video blob replaces the hex
    derivation only; the byte-window kernel is unchanged."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.hex(F.encode("text", "UTF-8")), "UTF-8").alias("blob"),
    )
    frame, nframes = 16, 3

    def sample(batches):
        for pdf in batches:
            ids, frames, digests = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                if blob is None:  # missing media -> no frames (as oracle)
                    continue
                raw = bytes(blob)
                for i in range(nframes):
                    chunk = raw[i * frame : (i + 1) * frame]
                    if len(chunk) < frame:
                        break
                    ids.append(doc_id)
                    frames.append(i)
                    digests.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": frames, "frame_md5": digests}
            )

    return d.mapInPandas(
        sample, schema="doc_id long, frame_no int, frame_md5 string"
    )


@register(
    "mm_audio_window",
    group="L",
    oracle="""
    WITH d AS (SELECT doc_id, text, row_number() OVER () AS rid
               FROM documents)
    SELECT doc_id, w AS window_no,
           CAST(SUM(ascii(substring(hex(encode(text)), w * 32 + i + 1, 1))
                    * ascii(substring(hex(encode(text)), w * 32 + i + 1, 1)))
                AS BIGINT) AS energy
    FROM d, generate_series(0, 3) AS gw(w),
            generate_series(0, 31) AS gi(i)
    WHERE length(hex(encode(text))) >= (w + 1) * 32
    -- grouped per physical ROW (rid), not per doc_id: re-delivered
    -- rows each emit their own windows, as the per-row kernel does
    GROUP BY rid, doc_id, w
    """,
)
def mm_audio_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-feature plumbing: treat the blob as a PCM sample stream and
    compute windowed ENERGY (sum of squared samples per fixed-stride
    window) — the primitive under VAD, silence trimming, and loudness
    normalization. The per-window math is vectorized numpy over Arrow
    batches (``frombuffer`` -> square -> reshape-sum: no Python loop
    per sample), which is exactly how a real audio featurizer runs on
    a cluster; a production decoder (soundfile/ffmpeg) replaces the
    frombuffer line only. The stand-in blob is the HEX rendition of
    the text bytes — pure ASCII by construction, so every byte value
    equals the oracle's ascii() code on ANY corpus (unicode-safe;
    see mm_frame_sample)."""
    import numpy as np

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.hex(F.encode("text", "UTF-8")), "UTF-8").alias("blob"),
    )
    win, nwin = 32, 4

    def energy(batches):
        for pdf in batches:
            ids, windows, energies = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                if blob is None:  # missing media -> no windows (as oracle)
                    continue
                raw = bytes(blob)
                usable = min(len(raw) // win, nwin)
                if usable == 0:
                    continue
                samples = np.frombuffer(
                    raw[: usable * win], dtype=np.uint8
                ).astype(np.int64)
                e = (samples * samples).reshape(usable, win).sum(axis=1)
                ids.extend([doc_id] * usable)
                windows.extend(range(usable))
                energies.extend(int(x) for x in e)
            yield pd.DataFrame(
                {"doc_id": ids, "window_no": windows, "energy": energies}
            )

    return d.mapInPandas(
        energy, schema="doc_id long, window_no int, energy long"
    )


@register(
    "mm_resize",
    group="L",
    oracle="""
    WITH d AS (SELECT doc_id, text, row_number() OVER () AS rid
               FROM documents)
    SELECT doc_id,
           CAST(length(hex(encode(text))) AS BIGINT) AS n_bytes,
           -- explicit NULL branch: DuckDB LEAST() SKIPS nulls, so
           -- LEAST(64, NULL) is 64, not NULL
           CAST(CASE WHEN text IS NULL THEN NULL
                     ELSE LEAST(64, (length(hex(encode(text))) + 1) // 2)
                END AS BIGINT) AS thumb_len,
           -- COALESCE to '': an EMPTY (non-NULL) blob thumbs to
           -- md5('') on the kernel side; all-NULL string_agg would
           -- wrongly yield NULL (degenerate-strings sweep)
           md5(CASE WHEN text IS NULL THEN NULL
                    ELSE COALESCE(string_agg(
             CASE WHEN 1 + 2 * i <= length(hex(encode(text)))
                  THEN substr(hex(encode(text)), 1 + 2 * i, 1) END,
             '' ORDER BY i), '') END) AS thumb_md5
    FROM d, generate_series(0, 63) AS g(i)
    -- grouped per physical ROW (rid): a re-delivered document thumbs
    -- twice, exactly as the per-row kernel emits
    GROUP BY rid, doc_id, text
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/downsample plumbing for the binary modality: each blob is
    stride-2 subsampled over its first 128 bytes into a ≤64-byte
    "thumbnail" — the shape a real image resize (PIL.thumbnail inside
    the same mapInPandas) would take, with a deterministic stand-in
    kernel so the result hash-checks against pure SQL (fixed-bound
    generate_series + ordered string_agg reconstructs the identical
    byte selection; the HEX-rendition stand-in blob keeps byte == char
    on ANY corpus — see mm_frame_sample).

    Per-row Arrow-batched transform, no shuffle; at 100 TB the resize
    rides the scan and output size is capped per row by construction —
    the thumbnail column is safely collectible downstream."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.hex(F.encode("text", "UTF-8")), "UTF-8").alias("blob"),
    )

    def resize(batches):
        # NULL blob = missing media: row survives with NULL features,
        # matching the oracle's NULL propagation.
        for pdf in batches:
            blobs = [None if b is None else bytes(b) for b in pdf["blob"]]
            thumbs = [None if b is None else b[0:128:2] for b in blobs]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(
                        [None if b is None else len(b) for b in blobs],
                        dtype="Int64",
                    ),
                    "thumb_len": pd.array(
                        [None if t is None else len(t) for t in thumbs],
                        dtype="Int64",
                    ),
                    "thumb_md5": [
                        None if t is None else hashlib.md5(t).hexdigest()
                        for t in thumbs
                    ],
                }
            )

    return d.mapInPandas(
        resize,
        schema="doc_id long, n_bytes long, thumb_len long, thumb_md5 string",
    )


@register(
    "mm_batch_embed",
    group="L",
    oracle="""
    SELECT doc_id, i - 1 AS dim_no,
           CAST(CAST('0x' || substr(md5(text), (i - 1) * 2 + 1, 2) AS INT)
                AS DOUBLE) / 255 AS val
    FROM documents, generate_series(1, 4) AS g(i)
    """,
)
def mm_batch_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched embedding-extraction plumbing — the GPU-inference batch
    shape: rows are re-chunked into fixed-size INFERENCE batches
    (64 here; in production the accelerator's optimal batch) inside
    mapInPandas, independent of however Arrow sliced the input, and
    each batch is "embedded" in one vectorized call. That
    re-batching loop — accumulate, cut, flush the remainder — is
    exactly what serving a real encoder (CLIP/Whisper/ViT) needs;
    the model call here is a deterministic md5-derived 4-dim kernel
    so the whole path stays hash-checked.

    Output is exploded to (doc_id, dim_no, val) — flat rows compare
    robustly across engines, and val = byte/255 is the same exact
    double division on both sides."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )
    batch_size, dims = 64, 4

    def embed_batches(batches):
        buf_ids, buf_blobs = [], []

        def flush():
            ids, dim_nos, vals = [], [], []
            for doc_id, blob in zip(buf_ids, buf_blobs):
                # missing media embeds to NULL dims (row count preserved,
                # matching the oracle's cross-join NULL propagation)
                h = None if blob is None else hashlib.md5(bytes(blob)).hexdigest()
                for j in range(dims):
                    ids.append(doc_id)
                    dim_nos.append(j)
                    vals.append(
                        None if h is None else int(h[j * 2 : j * 2 + 2], 16) / 255
                    )
            buf_ids.clear()
            buf_blobs.clear()
            return pd.DataFrame(
                {"doc_id": ids, "dim_no": dim_nos, "val": vals}
            )

        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                buf_ids.append(doc_id)
                buf_blobs.append(blob)
                if len(buf_ids) >= batch_size:
                    yield flush()
        if buf_ids:
            yield flush()

    return d.mapInPandas(
        embed_batches, schema="doc_id long, dim_no int, val double"
    )
