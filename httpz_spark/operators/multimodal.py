"""Multimodal (binary-payload) operators.

Images/audio/video ride as opaque ``binary`` columns with typed metadata
(the input_hint table shape).  Decode / feature-extract / resize run as
``mapInPandas`` stages: Arrow moves the bytes in batches, numpy does the
math, and the Spark-side plumbing (schema, partitioning, batch shape) is
real and tested even where an actual codec is stubbed.

Stub policy (no PIL/ffmpeg in this container):
* PNG + the deterministic fake-lossy container decode for real
  (:mod:`httpz_spark.codecs.images`);
* true JPEG decode raises NotImplementedError inside the codec; the
  operator catches it per row and emits ``decode_ok = false`` — a poison
  byte-blob never kills the task;
* :func:`frame_sample` (video) is REAL over the fabric's SPKV container
  (:mod:`httpz_spark.codecs.video`: seekable index + independently-
  decodable frames, the MJPEG shape); only true inter-coded formats
  (H.264 etc.) would need ffmpeg, which slots behind the same functions.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

DECODE_STATS_SCHEMA = (
    "image_id string, w int, h int, fmt string, decode_ok boolean, "
    "mean_lum double, std_lum double, phash_check long"
)


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode every payload and emit pixel statistics + recomputed phash
    (validates bytes -> pixels round trip at scale)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from httpz_spark.codecs.images import average_hash, decode_image

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                row = {
                    "image_id": r.image_id, "w": r.w, "h": r.h, "fmt": r.fmt,
                    "decode_ok": False, "mean_lum": None, "std_lum": None,
                    "phash_check": None,
                }
                try:
                    px = decode_image(bytes(r.bytes), r.fmt)
                    row.update(
                        decode_ok=True,
                        mean_lum=float(px.mean()),
                        std_lum=float(px.std()),
                        phash_check=average_hash(px),
                    )
                except Exception:  # stub codec OR corrupt bytes —
                    pass               # flagged, never fatal (poison-safe)
                out.append(row)
            yield pd.DataFrame.from_records(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        run, schema=DECODE_STATS_SCHEMA
    )


RESIZE_SCHEMA = "image_id string, thumb_w int, thumb_h int, thumb binary"


def resize_thumbnails(images: DataFrame, size: int = 8) -> DataFrame:
    """Block-mean resize to size×size grayscale thumbnails (numpy,
    vectorized per image)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from httpz_spark.codecs.images import decode_image

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(bytes(r.bytes), r.fmt)
                except Exception:  # stub codec OR corrupt bytes: skip row
                    continue
                gray = px.astype(np.float64).mean(axis=2)
                h, w = gray.shape
                ys = (np.arange(size + 1) * h) // size
                xs = (np.arange(size + 1) * w) // size
                thumb = np.empty((size, size), dtype=np.uint8)
                for i in range(size):
                    for j in range(size):
                        thumb[i, j] = int(
                            gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                                 xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
                        )
                out.append({
                    "image_id": r.image_id, "thumb_w": size, "thumb_h": size,
                    "thumb": thumb.tobytes(),
                })
            yield pd.DataFrame.from_records(out) if out else pd.DataFrame(
                columns=["image_id", "thumb_w", "thumb_h", "thumb"]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema=RESIZE_SCHEMA)


EMBED_SCHEMA = "image_id string, embedding array<float>"


def image_embeddings(images: DataFrame, dim: int = 64) -> DataFrame:
    """Classical tiny-image descriptor as the embedding: 8x8 block-mean
    luminance, mean-centered + L2-normalized (a real, deterministic
    function of the decoded pixels — the pre-deep-learning baseline for
    image similarity).  NOT a learned model: a neural encoder slots into
    the same mapInPandas stage with the same schema when its weights/
    runtime are available."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from httpz_spark.codecs.images import decode_image

        side = int(np.sqrt(dim))
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(bytes(r.bytes), r.fmt)
                except Exception:  # stub codec OR corrupt bytes: skip row
                    continue
                gray = px.astype(np.float64).mean(axis=2)
                h, w = gray.shape
                ys = (np.arange(side + 1) * h) // side
                xs = (np.arange(side + 1) * w) // side
                v = np.empty(dim, dtype=np.float64)
                for i in range(side):
                    for j in range(side):
                        v[i * side + j] = gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                                               xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
                v = v - v.mean()
                n = np.linalg.norm(v)
                v = v / n if n > 0 else v
                out.append({"image_id": r.image_id, "embedding": v.astype(np.float32).tolist()})
            yield pd.DataFrame.from_records(out) if out else pd.DataFrame(
                columns=["image_id", "embedding"]
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(run, schema=EMBED_SCHEMA)


FRAMES_SCHEMA = (
    "media_id string, fps int, n_frames int, frame_idx int, frame binary, "
    "decode_ok boolean"
)


def frame_sample(media: DataFrame, every_n: int = 4, id_col: str = "media_id") -> DataFrame:
    """REAL video frame sampler over the SPKV container
    (:mod:`httpz_spark.codecs.video` — an MJPEG-shaped index header +
    independently-decodable frames; an ffmpeg-backed decoder slots behind
    the same parse/extract functions when the lib is present).

    Emits every ``every_n``-th frame as its encoded image payload
    (decodable with :func:`httpz_spark.codecs.images.decode_image`).
    Random access via the index: only sampled frames' bytes are sliced —
    the operator never decodes pixels it does not emit.  A corrupt/foreign
    payload yields ONE row with ``decode_ok=false`` and no frame (poison
    is flagged, never fatal, and never silently dropped)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from httpz_spark.codecs.video import video_index

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                mid = getattr(r, id_col)
                data = bytes(r.bytes)
                try:
                    fps, n_frames, spans = video_index(data)
                except Exception:  # poison blob — flagged, not fatal
                    out.append({
                        "media_id": mid, "fps": None, "n_frames": None,
                        "frame_idx": None, "frame": None, "decode_ok": False,
                    })
                    continue
                for idx in range(0, n_frames, every_n):
                    off, ln = spans[idx]
                    out.append({
                        "media_id": mid, "fps": fps, "n_frames": n_frames,
                        "frame_idx": idx, "frame": data[off:off + ln],
                        "decode_ok": True,
                    })
            yield pd.DataFrame.from_records(out) if out else pd.DataFrame(
                columns=["media_id", "fps", "n_frames", "frame_idx",
                         "frame", "decode_ok"]
            )

    return media.select(F_col(id_col), "bytes").mapInPandas(run, schema=FRAMES_SCHEMA)


def F_col(name):
    from pyspark.sql import functions as F

    return F.col(name)


# ---------------------------------------------------------------------------
# the north-star per-row fetch invariant, as a DISTRIBUTED stage
# (BASELINE.json input_hint: "decoded-pixel allclose (PSNR>=40dB for lossy)
# + caption equality"; previously only enforced by a driver-side test)
# ---------------------------------------------------------------------------

VALIDATION_SCHEMA = (
    "url_hash long, image_id string, decode_ok boolean, pixel_ok boolean, "
    "psnr_db double, caption_ok boolean, phash_ok boolean, valid boolean"
)


def validate_payloads(results: DataFrame, fabric_cfg, psnr_min: float = 40.0) -> DataFrame:
    """Validate every fetched payload row against the reference source:

    * decode the stored ``bytes`` and compare with the regenerated
      reference pixels — exact for lossless, PSNR >= ``psnr_min`` dB for
      lossy (``pixel_ok``);
    * the payload table's ``caption`` must appear verbatim (normalized) in
      the fetched page's ``body_clean`` (``caption_ok`` — caption
      equality between the stored row and what the crawl observed);
    * ``phash`` must equal the hash recomputed from the decoded pixels
      (``phash_ok``).

    Runs as one ``mapInPandas`` stage (Arrow batches, numpy decode); rows
    without a fetched payload (final-error rows, non-page URLs) emit
    ``valid = NULL`` — they have nothing to validate."""
    from collections.abc import Iterator

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from httpz_spark.codecs.images import average_hash, decode_image, psnr
        from httpz_spark.parity.refmodel import normalize_text
        from httpz_spark.sources.fabric import image_pixels

        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                row = {
                    "url_hash": r.url_hash, "image_id": r.image_id,
                    "decode_ok": None, "pixel_ok": None, "psnr_db": None,
                    "caption_ok": None, "phash_ok": None, "valid": None,
                }
                fetched = r.status is not None and r.status >= 0
                if fetched and r.image_id is not None and r.bytes is not None:
                    try:
                        px = decode_image(bytes(r.bytes), r.fmt)
                        ref = image_pixels(r.image_id, fabric_cfg)
                        # lossless rows give PSNR=inf; cap at 99 dB so the
                        # column stays finite (round/oracle-friendly)
                        p = min(psnr(px, ref), 99.0)
                        row.update(
                            decode_ok=True, psnr_db=float(p),
                            pixel_ok=bool(p >= psnr_min),
                            phash_ok=bool(average_hash(px) == r.phash),
                        )
                    except Exception:  # stub codec OR corrupt bytes
                        row.update(decode_ok=False, pixel_ok=False,
                                   phash_ok=False)
                    if r.caption is not None and r.body_clean is not None:
                        row["caption_ok"] = normalize_text(r.caption) in r.body_clean
                    else:
                        row["caption_ok"] = False
                    row["valid"] = bool(
                        row["decode_ok"] and row["pixel_ok"]
                        and row["caption_ok"] and row["phash_ok"]
                    )
                out.append(row)
            yield pd.DataFrame.from_records(out)

    cols = ["url_hash", "image_id", "bytes", "fmt", "caption", "phash",
            "body_clean", "status"]
    return results.select(*cols).mapInPandas(run, schema=VALIDATION_SCHEMA)
