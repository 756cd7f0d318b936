"""Multimodal binary columns: image / audio / video as opaque bytes with
typed metadata, decoded and processed behind mapInPandas boundaries.

This generalizes the engine's waveform pattern (sources/waveforms.py —
the reference's MiniSEED blobs) to training-data media pipelines: media
live as a ``binary`` column plus a typed metadata struct IN the table (the
100 TB layout — never a file per record), and every processing step is an
Arrow-batched, shuffle-free mapInPandas stage:

    blob → decode(metadata) → resize / frame-sample / feature-extract

Real codecs (PIL/libsndfile/ffmpeg) are not in this environment, so the
container format here is a deterministic synthetic codec (fixed headers,
constant-fill or text-derived payloads) — the decode/resize/pool/sample
ARITHMETIC and all Spark plumbing are real and oracle-checked; swapping in
a real codec replaces only the pure-Python ``_decode_*`` bodies behind the
same schemas (``real_image_decoder`` below is the gated slot).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id bigint, kind string, content binary"

META_SCHEMA = (
    "media_id bigint, kind string, width int, height int, "
    "sample_rate int, n_samples int, n_frames int, n_bytes int"
)

# --- synthetic codec ------------------------------------------------------

_MAGIC = {"image": b"IMG0", "audio": b"AUD0", "video": b"VID0"}


def encode_fake_image(media_id: int) -> bytes:
    """IMG0 | width u16 | height u16 | pixels (constant fill media_id%256)."""
    w = 16 + media_id % 48
    h = 16 + (media_id * 7) % 48
    return _MAGIC["image"] + struct.pack(">HH", w, h) + bytes([media_id % 256]) * (w * h)


def encode_fake_audio(media_id: int) -> bytes:
    """AUD0 | sample_rate u32 | n_samples u32 | samples i8 (sawtooth)."""
    sr = 8000 if media_id % 2 == 0 else 16000
    n = 64 + (media_id * 13) % 192
    samples = bytes((i * 3 + media_id) % 256 for i in range(n))
    return _MAGIC["audio"] + struct.pack(">II", sr, n) + samples


def encode_fake_video(media_id: int) -> bytes:
    """VID0 | n_frames u16 | w u8 | h u8 | frames (constant fill per frame)."""
    nf = 8 + media_id % 24
    w, h = 8, 8
    frames = b"".join(bytes([(media_id + f) % 256]) * (w * h) for f in range(nf))
    return _MAGIC["video"] + struct.pack(">HBB", nf, w, h) + frames


def media_table(documents: DataFrame, per_kind: int = 60) -> DataFrame:
    """Build the media table from the documents dimension: one blob per
    doc_id per kind, generated IN the executors (binary column, no files).
    """
    docs = documents.select("doc_id").filter(F.col("doc_id") < per_kind)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                m = int(doc_id)
                rows.append({"media_id": m, "kind": "image", "content": encode_fake_image(m)})
                rows.append({"media_id": m, "kind": "audio", "content": encode_fake_audio(m)})
                rows.append({"media_id": m, "kind": "video", "content": encode_fake_video(m)})
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    return docs.mapInPandas(gen, schema=MEDIA_SCHEMA)


# --- decode ---------------------------------------------------------------


def _decode_header(kind: str, blob: bytes) -> dict:
    if blob[:4] != _MAGIC[kind]:
        raise ValueError(f"bad magic for {kind}: {blob[:4]!r}")
    if kind == "image":
        w, h = struct.unpack(">HH", blob[4:8])
        return {"width": w, "height": h, "sample_rate": None, "n_samples": None, "n_frames": None}
    if kind == "audio":
        sr, n = struct.unpack(">II", blob[4:12])
        return {"width": None, "height": None, "sample_rate": sr, "n_samples": n, "n_frames": None}
    nf, w, h = struct.unpack(">HBB", blob[4:8])
    return {"width": w, "height": h, "sample_rate": None, "n_samples": None, "n_frames": nf}


def decode_media_metadata(media: DataFrame) -> DataFrame:
    """Blob → typed metadata row; one narrow pass, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                meta = _decode_header(r.kind, bytes(r.content))
                rows.append(
                    {"media_id": r.media_id, "kind": r.kind, **meta, "n_bytes": len(r.content)}
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "sample_rate",
                         "n_samples", "n_frames", "n_bytes"],
            )

    return media.mapInPandas(run, schema=META_SCHEMA)


def real_image_decoder(blob: bytes) -> np.ndarray:
    """Real-codec slot (PIL): decode an encoded image blob to an (H, W, C)
    uint8 array — the same contract the synthetic codec plumbing carries
    through decode/resize/feature stages. Skip-if-absent-tested in
    tests/test_real_artifacts.py — live as soon as PIL is installed."""
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "PIL not available; the synthetic codec exercises the same "
            "plumbing — plug a real decoder into this slot in production"
        ) from e
    import io

    with Image.open(io.BytesIO(blob)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


# --- transforms -----------------------------------------------------------


def image_resize_pool(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Average-pool resize of decoded image pixels → (media_id, out_w,
    out_h, mean_pixel). Resize happens per batch in numpy; output is small
    (stats/thumbnail grain), which is the scale-correct shape — never
    re-emit full-resolution pixels you don't need downstream.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                blob = bytes(r.content)
                w, h = struct.unpack(">HH", blob[4:8])
                px = np.frombuffer(blob[8:], dtype=np.uint8).astype(np.float64)
                img = px.reshape(h, w)
                # crop-to-multiple average pooling
                ch, cw = (h // out_h) * out_h, (w // out_w) * out_w
                pooled = (
                    img[:ch, :cw]
                    .reshape(out_h, ch // out_h, out_w, cw // out_w)
                    .mean(axis=(1, 3))
                )
                rows.append(
                    {"media_id": r.media_id, "out_w": out_w, "out_h": out_h,
                     "mean_pixel": float(pooled.mean())}
                )
            yield pd.DataFrame(rows, columns=["media_id", "out_w", "out_h", "mean_pixel"])

    return media.mapInPandas(
        run, schema="media_id bigint, out_w int, out_h int, mean_pixel double"
    )


def video_sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Every ``stride``-th frame → one row per sampled frame with its mean
    pixel value (the frame-sampling grain a vision pipeline trains on)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                blob = bytes(r.content)
                nf, w, h = struct.unpack(">HBB", blob[4:8])
                frames = np.frombuffer(blob[8:], dtype=np.uint8).reshape(nf, h * w)
                for f in range(0, nf, stride):
                    rows.append(
                        {"media_id": r.media_id, "frame_ix": f,
                         "frame_mean": float(frames[f].astype(np.float64).mean())}
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_ix", "frame_mean"])

    return media.mapInPandas(
        run, schema="media_id bigint, frame_ix int, frame_mean double"
    )


def media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic byte-histogram feature vector per blob — the stub for
    an NN embedding model (production: Arrow-batched predict UDF in this
    exact slot; the model artifact is external, the interface is this).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                b = np.frombuffer(bytes(r.content), dtype=np.uint8)
                hist, _ = np.histogram(b, bins=dim, range=(0, 256))
                feat = hist.astype(np.float64) / max(len(b), 1)
                rows.append(
                    {"media_id": r.media_id, "kind": r.kind, "feature": feat.tolist()}
                )
            yield pd.DataFrame(rows, columns=["media_id", "kind", "feature"])

    return media.mapInPandas(
        run, schema="media_id bigint, kind string, feature array<double>"
    )


def audio_window_energy(
    media: DataFrame, win: int = 32, stride: int = 16
) -> DataFrame:
    """Sliding-window audio features over the binary audio column: per
    full window of ``win`` samples (hop ``stride``), the integer sample
    energy (sum of squares) and mean amplitude — the frame-level feature
    grid every audio-pretraining pipeline computes before any model.

    Same plumbing contract as the other media stages: Arrow-batched
    mapInPandas, shuffle-free, one output row per (media, window); the
    decode is the pluggable seam — the synthetic AUD0 container here, a
    real codec (soundfile/ffmpeg) in production. Integer arithmetic keeps
    the features exactly reproducible by the SQL oracle.
    """
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for media_id, kind, blob in zip(b["media_id"], b["kind"], b["content"]):
                if kind != "audio":
                    continue
                meta = _decode_header(kind, bytes(blob))
                n = meta["n_samples"]
                samples = np.frombuffer(
                    bytes(blob)[12 : 12 + n], dtype=np.uint8
                ).astype(np.int64)
                for w_idx in range((n - win) // stride + 1):
                    seg = samples[w_idx * stride : w_idx * stride + win]
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "window_idx": w_idx,
                            "energy": int(np.sum(seg * seg)),
                            "mean_amp": float(np.sum(seg)) / win,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "window_idx", "energy", "mean_amp"],
            )

    return media.mapInPandas(
        run,
        schema="media_id long, window_idx int, energy long, mean_amp double",
    )
