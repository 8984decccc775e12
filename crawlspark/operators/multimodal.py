"""Multimodal columns: opaque binary payloads + typed metadata.

Media payloads (image/audio/video referenced by the crawl's media spans)
are carried as `binary` columns with a typed metadata struct.  The Spark
plumbing — schema, partition-preserving mapInPandas, Arrow batch shapes —
is real and tested; the codec step is stubbed because the decode libs
(Pillow/ffmpeg/soundfile) are not in this container:

  * ``decode_media(df, decoder="fake")`` uses a deterministic fake decoder
    (metadata derived from the bytes) so pipelines and tests run;
  * ``decoder="real"`` raises NotImplementedError at the exact seam where
    a real codec plugs in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_kind", T.StringType()),   # image|audio|video
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("content_hash", T.StringType()),
    ]
)

DECODED = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("meta", MEDIA_META),
        T.StructField("features", T.ArrayType(T.FloatType())),  # embedding stub
    ]
)


def _fake_decode(payload: bytes, media_ref: str) -> tuple[dict, list[float]]:
    """Deterministic stand-in: metadata + an 8-dim 'feature' vector purely
    from the bytes, so downstream joins/ANN are exercised end-to-end."""
    h = hashlib.md5(payload).digest()
    kind = ("image", "audio", "video")[h[0] % 3]
    meta = {
        "media_kind": kind,
        "n_bytes": len(payload),
        "width": 160 + h[1] % 480 if kind != "audio" else None,
        "height": 120 + h[2] % 360 if kind != "audio" else None,
        "duration_ms": (1000 + int.from_bytes(h[3:5], "big")) if kind != "image" else None,
        "content_hash": h.hex(),
    }
    feats = [((b / 255.0) - 0.5) for b in h[:8]]
    return meta, feats


def _real_decode(payload: bytes, media_ref: str):
    raise NotImplementedError(
        "real media decode needs codec libraries (Pillow/ffmpeg/soundfile) "
        "that are not installed in this environment; plug them in here"
    )


def decode_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """df(doc_id string, media_ref string, payload binary) → DECODED rows.

    mapInPandas (iterator-of-batches) so a real decoder can hold per-
    partition state (codec contexts, GPU handles) across batches.
    """
    dec = _fake_decode if decoder == "fake" else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                meta, feats = dec(payload, r.media_ref)
                rows.append(
                    {"doc_id": r.doc_id, "media_ref": r.media_ref,
                     "meta": meta, "features": feats}
                )
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=DECODED)


def media_payloads_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a (doc_id, media_ref, payload binary) table from the crawl's
    documents table: one row per media span, payload = deterministic bytes
    keyed by the media_ref (the sandbox's stand-in for a blob-store fetch)."""
    spans = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "media").filter(F.col("s.media_ref").isNotNull())
    return spans.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.encode(F.repeat(F.sha2(F.col("s.media_ref"), 256), 4), "UTF-8").alias("payload"),
    )


RESIZED = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def fit_box(width: int, height: int, max_w: int, max_h: int) -> tuple[int, int]:
    """Aspect-preserving fit into (max_w, max_h), integer arithmetic only
    (deterministic across engines — no float scale factor)."""
    if width <= max_w and height <= max_h:
        return width, height
    if width * max_h <= height * max_w:  # height-bound
        return max(1, width * max_h // height), max_h
    return max_w, max(1, height * max_w // width)


def resize_media(df: DataFrame, max_w: int = 320, max_h: int = 240,
                 decoder: str = "fake") -> DataFrame:
    """IMAGE payloads → aspect-preserving downscale.  The geometry math is
    real; the pixel transform is the stubbed codec seam (fake: payload
    re-keyed by the target box) — real Pillow plugs into the same
    mapInPandas without touching the Spark plumbing."""
    dec = _fake_decode if decoder == "fake" else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                meta, _ = dec(payload, r.media_ref)
                if meta["media_kind"] != "image":
                    continue
                w, h = meta["width"], meta["height"]
                nw, nh = fit_box(w, h, max_w, max_h)
                rows.append({
                    "doc_id": r.doc_id, "media_ref": r.media_ref,
                    "width": w, "height": h, "new_width": nw, "new_height": nh,
                    "payload": hashlib.md5(
                        f"{meta['content_hash']}:{nw}x{nh}".encode()
                    ).digest(),  # stub pixels; real resize output goes here
                })
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=RESIZED)


FRAMES = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 8,
                  decoder: str = "fake") -> DataFrame:
    """VIDEO payloads → one row per sampled frame at every_ms intervals,
    capped at max_frames — the 1→N exploding mapInPandas shape a video
    training pipeline needs.  The frame schedule (count, timestamps) is
    real; frame extraction is the stubbed codec seam (fake: frame bytes
    keyed by content_hash + index; real ffmpeg plugs in here)."""
    dec = _fake_decode if decoder == "fake" else _real_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                meta, _ = dec(payload, r.media_ref)
                if meta["media_kind"] != "video":
                    continue
                dur = int(meta["duration_ms"])
                n = min(max_frames, max(1, -(-dur // every_ms)))  # ceil
                for i in range(n):
                    fh = hashlib.md5(
                        f"{meta['content_hash']}:{i}".encode()
                    ).hexdigest()
                    rows.append({
                        "doc_id": r.doc_id, "media_ref": r.media_ref,
                        "frame_idx": i, "ts_ms": i * every_ms,
                        "frame_hash": fh, "frame": bytes.fromhex(fh),
                    })
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAMES)


PHASH = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("phash", T.LongType()),   # 64-bit dHash (signed carrier)
        T.StructField("b0", T.IntegerType()),   # 4 x 16-bit LSH bands
        T.StructField("b1", T.IntegerType()),
        T.StructField("b2", T.IntegerType()),
        T.StructField("b3", T.IntegerType()),
    ]
)


def _dhash64(grid: bytes) -> int:
    """dHash over a 9x8 luminance grid: bit (r,c) = px[r][c] > px[r][c+1].
    Returns the UNSIGNED 64-bit value.  Locality-preserving by
    construction — flipping one grid byte flips at most 2 hash bits."""
    h = 0
    for r in range(8):
        for c in range(8):
            if grid[r * 9 + c] > grid[r * 9 + c + 1]:
                h |= 1 << (r * 8 + c)
    return h


def phash_media(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """(doc_id, media_ref, payload) → 64-bit perceptual hash (dHash) +
    4x16-bit LSH bands.  The hash math (9x8 grid → 64 gradient bits →
    band split) is real; producing the grid from pixels is the codec seam:
    the fake decoder reads the grid STRAIGHT from the payload bytes
    (repeated/truncated to 72), so near-identical payloads get
    near-identical hashes — the locality a perceptual hash must have, and
    what makes the near-dup join testable without Pillow.  Row-local Arrow
    stage, zero shuffle."""
    if decoder == "real":
        return _real_decode(b"", "")  # raises at the seam

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload) if r.payload is not None else b""
                # pad-only, never tile: tiling would map one payload byte
                # into several grid cells, breaking the ≤2-bits-per-byte
                # locality bound for sub-72-byte payloads
                grid = payload[:72] + b"\x00" * max(0, 72 - len(payload))
                u = _dhash64(grid)
                rows.append({
                    "doc_id": r.doc_id, "media_ref": r.media_ref,
                    "phash": u - (1 << 64) if u >= (1 << 63) else u,
                    "b0": u & 0xFFFF, "b1": (u >> 16) & 0xFFFF,
                    "b2": (u >> 32) & 0xFFFF, "b3": (u >> 48) & 0xFFFF,
                })
            if rows:
                yield pd.DataFrame(rows)

    return df.select("doc_id", "media_ref", "payload").mapInPandas(
        run, schema=PHASH
    )


def phash_neardup_pairs(hashes: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Banded-LSH near-dup join over perceptual hashes: candidates share at
    least one of the 4 16-bit bands (pigeonhole: EVERY pair within Hamming
    distance 3 is guaranteed caught; more distant pairs probabilistically),
    then the exact Hamming distance — bit_count(xor), JVM-side — verifies.
    The only shuffle is the band-key equi-join, uniform keys; never an
    all-pairs comparison, the same shape as the MinHash text-dedup join."""
    bands = hashes.select(
        "media_ref", "phash",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("bi"), F.col(f"b{i}").alias("bv"))
                for i in range(4)
            ])
        ).alias("b"),
    ).select("media_ref", "phash", F.col("b.bi").alias("bi"),
             F.col("b.bv").alias("bv"))
    right = bands.select(
        F.col("media_ref").alias("ref_b"), F.col("phash").alias("phash_b"),
        "bi", "bv",
    )
    cand = (
        bands.join(right, on=["bi", "bv"])
        .filter(F.col("media_ref") < F.col("ref_b"))
        .select(F.col("media_ref").alias("ref_a"), "phash", "ref_b", "phash_b")
        .distinct()
    )
    return cand.select(
        "ref_a", "ref_b",
        F.expr("bit_count(phash ^ phash_b)").cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
