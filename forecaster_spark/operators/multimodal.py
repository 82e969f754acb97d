"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing — schemas, partitioning, kernel signatures, batch
shapes — is real and tested, and two decoders are REAL pure-numpy codecs
(no media libraries ship in this container, but these formats need none):

- ``image/bmp``  : uncompressed 24-bit BITMAPINFOHEADER — parsed width/
                   height/pixels; features = Rec.601 luma mean + a
                   block-averaged luma thumbnail vector.
- ``audio/wav``  : RIFF PCM16 mono — parsed sample rate/samples; features =
                   RMS + per-block RMS energy vector.
- ``video/avi``  : uncompressed RIFF-AVI ('DIB ' stream, raw bottom-up BGR
                   ``00db`` frames + idx1) — parsed per-frame pixels;
                   features = mean luma over all frames + a per-frame
                   mean-luma temporal vector. Compressed containers
                   (``video/mp4``) genuinely need pyav and raise in
                   ``strict`` mode.

Decode modes: ``"strict"`` (decode or raise), ``"auto"`` (decode supported
formats, deterministic fake features otherwise), ``"fake"`` (all fake —
pure-plumbing runs).

Scale notes: payloads stay columnar (Parquet binary) and are only
materialized inside the kernel batch; feature extraction is embarrassingly
parallel, so the operator repartitions by asset hash — uniform, no skew.
``maxRecordsPerBatch`` bounds Arrow batch memory when payloads are large.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "asset_id string, mime string, n_bytes long, width int, height int, "
    "n_frames int, mean_luma double, sample_rate int, rms double, "
    "decoded boolean, feature array<float>"
)


# -- pure-numpy codecs -------------------------------------------------------

def bmp_encode(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding)."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    pad = np.zeros((h, row_size - w * 3), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    return header + info + np.concatenate([bgr, pad], axis=1).tobytes()


def bmp_decode(blob: bytes) -> np.ndarray:
    """Inverse of :func:`bmp_encode` → (h, w, 3) uint8 RGB."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", blob, 10)
    hdr_size, w, h, _planes, bpp = struct.unpack_from("<IiiHH", blob, 14)
    if bpp != 24 or hdr_size < 40:
        raise ValueError(f"unsupported BMP variant (bpp={bpp})")
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(blob, np.uint8, count=row_size * abs(h), offset=off).reshape(
        abs(h), row_size
    )
    img = rows[:, : w * 3].reshape(abs(h), w, 3)[:, :, ::-1]  # BGR→RGB
    return img[::-1] if h > 0 else img  # bottom-up unless height negative


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(data), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )


def wav_decode(blob: bytes) -> tuple[np.ndarray, int]:
    """Inverse of :func:`wav_encode` → (int16 samples, sample_rate); walks
    RIFF chunks, PCM16 mono only."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, sr, samples = 12, None, None
    while pos + 8 <= len(blob):
        cid, sz = struct.unpack_from("<4sI", blob, pos)
        body = blob[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt_tag, n_ch, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag != 1 or n_ch != 1 or bits != 16:
                raise ValueError("unsupported WAV variant (PCM16 mono only)")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)
    if sr is None or samples is None:
        raise ValueError("WAV missing fmt/data chunks")
    return samples, sr


def _dib_rows(frame: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → raw DIB bytes (bottom-up BGR, 4-byte row pad)."""
    h, w, _ = frame.shape
    row_size = (w * 3 + 3) & ~3
    pad = np.zeros((h, row_size - w * 3), dtype=np.uint8)
    bgr = frame[::-1, :, ::-1].reshape(h, w * 3)
    return np.concatenate([bgr, pad], axis=1).tobytes()


def _dib_undo(body: bytes, w: int, h: int, top_down: bool = False) -> np.ndarray:
    """Inverse of :func:`_dib_rows` → (h, w, 3) uint8 RGB. ``top_down``
    for negative-biHeight DIBs, whose rows are already in display order."""
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(body, np.uint8, count=row_size * h).reshape(h, row_size)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return img if top_down else img[::-1]


def avi_encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, h, w, 3) uint8 RGB frames → uncompressed RIFF-AVI bytes: one
    'vids'/'DIB ' stream, raw bottom-up-BGR ``00db`` chunks, idx1 index.

    Layout (all sizes closed-form in n/w/h — the contract oracle recomputes
    them): 12-byte RIFF header + 200-byte hdrl LIST (avih 56 + strl[strh 56,
    strf 40]) + movi LIST (12 + n·(8 + row_size·h)) + idx1 (8 + 16·n)."""
    n, h, w, _ = frames.shape
    row_size = (w * 3 + 3) & ~3
    fsize = row_size * h
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, fsize * fps, 0, 0x10,  # usec/frame, bytes/sec, pad, HASINDEX
        n, 0, 1, fsize, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIi4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, fsize, 0, 0, 0, 0, 0, 0,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, fsize, 2835, 2835, 0, 0)
    strl = b"LIST" + struct.pack("<I", 4 + 8 + len(strh) + 8 + len(strf)) + b"strl" \
        + b"strh" + struct.pack("<I", len(strh)) + strh \
        + b"strf" + struct.pack("<I", len(strf)) + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih) + len(strl)) + b"hdrl" \
        + b"avih" + struct.pack("<I", len(avih)) + avih + strl
    chunks = b"".join(
        b"00db" + struct.pack("<I", fsize) + _dib_rows(frames[i]) for i in range(n)
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(chunks)) + b"movi" + chunks
    idx = b"idx1" + struct.pack("<I", 16 * n) + b"".join(
        b"00db" + struct.pack("<III", 0x10, 4 + i * (8 + fsize), fsize)
        for i in range(n)
    )
    body = b"AVI " + hdrl + movi + idx
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(blob: bytes) -> tuple[np.ndarray, float]:
    """Inverse of :func:`avi_encode` → ((n, h, w, 3) uint8 RGB, fps); walks
    RIFF chunks, uncompressed 24-bit 'DIB ' streams only. fps is
    rate/scale as a float (fractional NTSC rates survive); dwScale=0
    raises rather than guessing."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    w = h = None
    top_down = False
    fps = 10
    in_vids = False  # strf chunks bind to the PRECEDING strh's stream type
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, fps, in_vids, top_down
        while pos + 8 <= end:
            cid, sz = struct.unpack_from("<4sI", blob, pos)
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + sz)  # skip the list-type fourcc
            elif cid == b"strh":
                fcc, handler = struct.unpack_from("<4s4s", blob, body_at)
                in_vids = fcc == b"vids"
                if in_vids:
                    if handler not in (b"DIB ", b"\0\0\0\0", b"RGB "):
                        raise ValueError(f"unsupported AVI codec {handler!r}")
                    scale, rate = struct.unpack_from("<II", blob, body_at + 20)
                    if scale == 0:
                        raise ValueError("AVI strh dwScale is 0")
                    fps = rate / scale  # float: NTSC 30000/1001 stays 29.97
            elif cid == b"strf" and in_vids and w is None:
                _hs, w, h, _planes, bpp = struct.unpack_from("<IiiHH", blob, body_at)
                if bpp != 24:
                    raise ValueError(f"unsupported AVI bit depth {bpp}")
                top_down = h < 0
                h = abs(h)
            elif cid in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("AVI frame chunk before strf header")
                frames.append(_dib_undo(blob[body_at : body_at + sz], w, h, top_down))
            pos = body_at + sz + (sz & 1)

    walk(12, len(blob))
    if not frames:
        raise ValueError("AVI contains no video frames")
    return np.stack(frames), fps


def _luma(img: np.ndarray) -> np.ndarray:
    """Rec.601 luma (float64) over the trailing RGB axis — works on a single
    (h, w, 3) image or an (n, h, w, 3) frame stack."""
    return img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114


def _block_means(v: np.ndarray, dim: int) -> np.ndarray:
    """dim block means over a 1-D float array (thumbnail/energy vector)."""
    n = len(v)
    if n == 0:
        return np.zeros(dim, dtype=np.float32)
    idx = (np.arange(dim + 1) * n) // dim
    sums = np.concatenate([[0.0], np.cumsum(v)])
    cnt = np.maximum(idx[1:] - idx[:-1], 1)
    return ((sums[idx[1:]] - sums[idx[:-1]]) / cnt).astype(np.float32)


# -- synthetic asset corpus --------------------------------------------------

def _video_pixels(i: int) -> np.ndarray:
    """Closed-form (n_frames, h, w, 3) uint8 pixel block for asset index
    ``i``: pixel[f,y,x,c] = (13i + 41f + 5y + 3x + 17c) mod 256. Every
    derived fact (dims, byte counts, integer luma sums) is therefore
    recomputable in plain SQL — the contract oracle certifies the decoded
    PIXELS, not just container sizes."""
    nf, h, w = 1 + i % 6, 4 + (i * 5) % 9, 4 + i % 9
    f, y, x, c = np.ogrid[0:nf, 0:h, 0:w, 0:3]
    return ((i * 13 + f * 41 + y * 5 + x * 3 + c * 17) % 256).astype(np.uint8)


def synth_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table with REAL format payloads: BMP
    images and WAV audio (content seeded per id — no RNG state, partition-
    invariant), plus uncompressed AVI video with formula pixels (see
    :func:`_video_pixels`)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
                rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
                kind = i % 3
                if kind == 0:
                    w, ht = 8 + i % 24, 8 + (i * 7) % 24
                    payload = bmp_encode(
                        rng.integers(0, 256, (ht, w, 3), dtype=np.uint8)
                    )
                    mime, meta = "image/bmp", {"w": str(w), "h": str(ht)}
                elif kind == 1:
                    sr = [8000, 16000][i % 2]
                    t = np.arange(256 + i % 256)
                    wave = 8000.0 * np.sin(2 * np.pi * t * (100 + i % 50) / sr)
                    payload = wav_encode(
                        (wave + rng.normal(0, 500, len(t))).astype(np.int16), sr
                    )
                    mime, meta = "audio/wav", {"sr": str(sr)}
                else:
                    frames = _video_pixels(i)
                    payload = avi_encode(frames, fps=10)
                    mime, meta = "video/avi", {"frames": str(frames.shape[0])}
                rows.append((f"asset-{i:08d}", mime, payload, meta))
            yield pd.DataFrame(rows, columns=["asset_id", "mime", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, schema=ASSET_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    h = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "big"))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(df: DataFrame, decode: str = "auto", dim: int = 16) -> DataFrame:
    """Decode/feature-extract kernel. Batch shape: one Arrow record batch of
    (asset_id, mime, payload, meta) in → one batch of typed features out.

    Per mime: BMP → parsed width/height + mean luma + block-luma thumbnail;
    WAV → parsed sample_rate + RMS + block-energy vector; AVI → parsed
    dims/frame count + mean luma over all frames + per-frame mean-luma
    temporal vector. Any undecodable payload in ``auto`` → deterministic
    content-hash fake features; ``strict`` raises where no real decoder
    exists (compressed containers: mp4/webm need pyav)."""
    if decode not in ("strict", "auto", "fake"):
        raise ValueError(f"unknown decode mode {decode!r}")

    def one(mime: str, payload: bytes, meta) -> dict:
        out = {
            "n_bytes": len(payload), "width": None, "height": None,
            "n_frames": None, "mean_luma": None, "sample_rate": None,
            "rms": None, "decoded": False, "feature": None,
        }
        try:
            if decode != "fake" and mime == "image/bmp":
                img = bmp_decode(payload)
                luma = _luma(img)
                out.update(
                    width=img.shape[1], height=img.shape[0], n_frames=1,
                    mean_luma=float(luma.mean()), decoded=True,
                    feature=_block_means(luma.ravel(), dim),
                )
                return out
            if decode != "fake" and mime == "audio/wav":
                samples, sr = wav_decode(payload)
                x = samples.astype(np.float64)
                out.update(
                    sample_rate=sr, n_frames=len(samples),
                    rms=float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
                    decoded=True, feature=_block_means(np.abs(x), dim),
                )
                return out
            if decode != "fake" and mime == "video/avi":
                frames, _fps = avi_decode(payload)
                per_frame = _luma(frames.astype(np.float64)).mean(axis=(1, 2))
                out.update(
                    width=frames.shape[2], height=frames.shape[1],
                    n_frames=frames.shape[0], mean_luma=float(per_frame.mean()),
                    decoded=True, feature=_block_means(per_frame, dim),
                )
                return out
        except (ValueError, struct.error):
            # corrupt/truncated payload: a real corpus always carries some.
            # strict surfaces it; auto falls through to the deterministic
            # fake-feature path below (decoded stays False) — one bad asset
            # must not abort a 10^12-row job.
            if decode == "strict":
                raise
        if decode == "strict":
            raise ValueError(
                f"media decode for {mime} requires pyav/PIL — not in this "
                "container; decoded formats: image/bmp, audio/wav, video/avi"
            )
        meta = meta or {}
        out.update(
            width=int(meta["w"]) if "w" in meta else None,
            height=int(meta["h"]) if "h" in meta else None,
            n_frames=int(meta["frames"]) if "frames" in meta else None,
            mean_luma=float(
                np.frombuffer(payload[:32].ljust(32, b"\0"), dtype=np.uint8).mean()
            ),
            feature=_fake_features(payload, dim),
        )
        return out

    def kernel(batches):
        for pdf in batches:
            recs = [
                one(m, p, mt)
                for m, p, mt in zip(pdf["mime"], pdf["payload"], pdf["meta"])
            ]
            out = pd.DataFrame(recs)
            out.insert(0, "mime", pdf["mime"].to_numpy())
            out.insert(0, "asset_id", pdf["asset_id"].to_numpy())
            yield out

    # uniform repartition by asset hash: payload sizes vary, ids don't skew
    return df.repartition(F.crc32(F.col("asset_id"))).mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling plan: explode per-frame rows (frame indices from
    metadata), keeping every ``every_n``-th frame — the cheap metadata-only
    path (no payload read). :func:`decode_frames` is the real-decode path."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1)
    sampled = F.filter(frames, lambda i: i % every_n == 0)
    return (
        df.where(F.col("mime").startswith("video/"))
        .withColumn("n_frames", F.element_at(F.col("meta"), "frames").cast("int"))
        .select("asset_id", F.explode(sampled).alias("frame_idx"))
    )


FRAME_SCHEMA = (
    "asset_id string, frame_idx int, width int, height int, luma_milli long"
)


def decode_frames(
    df: DataFrame, every_n: int = 1, on_error: str = "skip"
) -> DataFrame:
    """REAL frame sampling: Arrow kernel decodes each AVI payload and emits
    one row per kept frame (every ``every_n``-th) with the frame's exact
    integer luma sum ``luma_milli`` = Σ_pixels (299·R + 587·G + 114·B) —
    pure int64 arithmetic, so a SQL oracle can recompute it bit-exactly from
    the synthetic generator's pixel formula.

    ``on_error``: ``"skip"`` (default) drops corrupt/undecodable payloads —
    the same one-bad-asset-must-not-abort-the-job posture as
    extract_features' auto mode; ``"fail"`` re-raises for strict runs.

    Scale: decode is per-asset embarrassingly parallel (same repartition-by-
    asset-hash layout as extract_features); output rows ≤ frames/every_n per
    asset, no shuffle after the kernel."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    if on_error not in ("skip", "fail"):
        raise ValueError(f"unknown on_error mode {on_error!r}")

    def kernel(batches):
        for pdf in batches:
            ids, fidx, ws, hs, lumas = [], [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    frames, _fps = avi_decode(payload)
                except (ValueError, struct.error):
                    if on_error == "fail":
                        raise
                    continue
                n, h, w, _ = frames.shape
                px = frames.astype(np.int64)
                milli = (
                    299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]
                ).sum(axis=(1, 2))
                for f in range(0, n, every_n):
                    ids.append(aid)
                    fidx.append(f)
                    ws.append(w)
                    hs.append(h)
                    lumas.append(int(milli[f]))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": np.array(fidx, dtype=np.int32),
                    "width": np.array(ws, dtype=np.int32),
                    "height": np.array(hs, dtype=np.int32),
                    "luma_milli": np.array(lumas, dtype=np.int64),
                }
            )

    return (
        df.where(F.col("mime") == "video/avi")
        .repartition(F.crc32(F.col("asset_id")))
        .mapInPandas(kernel, schema=FRAME_SCHEMA)
    )
