"""Multimodal column processing: decode / feature-extract / resize /
frame-sample over opaque ``binary`` cells.

Design (SURVEY §1.2): media stays as *encoded bytes* in ``BinaryType``
columns with typed metadata companions (``_<tensor>_shape`` etc.) —
never decoded at rest, mirroring the reference's ``sample_compression``
storage.  Processing runs in Arrow-batched ``mapInPandas`` stages so a
1000-executor cluster decodes in parallel with no driver involvement.

The actual codecs (PIL / av / soundfile) are NOT installed in this
container, so the decode kernels are stubbed: when the library import
fails, ``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, which produces a deterministic fake decode (shape +
checksum derived from the bytes) so the Spark-side plumbing — schema,
batching, partitioning, UDF signatures — is fully real and testable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _try_pil():
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def _fake_decode(data: bytes) -> tuple[int, int, int, str]:
    """Deterministic fake decode: pseudo shape + content checksum."""
    digest = hashlib.md5(data or b"").digest()
    h = 16 + digest[0] % 48
    w = 16 + digest[1] % 48
    return h, w, 3, digest.hex()


IMAGE_META_SCHEMA = T.StructType([
    T.StructField("height", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("checksum", T.StringType()),
])


def decode_image_batch(
    df: DataFrame,
    bytes_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Append decoded image metadata (height/width/channels/checksum).

    Real path uses PIL when importable; otherwise ``fake=True`` runs the
    deterministic stub, and ``fake=False`` raises NotImplementedError —
    clearly marking the codec gap rather than silently guessing.
    """
    pil = _try_pil()
    if pil is None and not fake:
        raise NotImplementedError(
            "image codec (PIL) not available in this environment; "
            "pass fake=True for the deterministic stub decode"
        )

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("image_meta", IMAGE_META_SCHEMA)]
    )

    def run(iterator: Iterator):
        import io

        import pandas as pd

        for pdf in iterator:
            metas = []
            for data in pdf[bytes_col]:
                raw = bytes(data) if data is not None else b""
                if pil is not None and not fake:
                    try:
                        with pil.open(io.BytesIO(raw)) as img:
                            w, h = img.size
                            c = len(img.getbands())
                        metas.append((h, w, c, hashlib.md5(raw).hexdigest()))
                        continue
                    except Exception:
                        metas.append((None, None, None, None))
                        continue
                metas.append(_fake_decode(raw))
            pdf = pdf.copy()
            pdf["image_meta"] = [
                {"height": m[0], "width": m[1], "channels": m[2], "checksum": m[3]}
                for m in metas
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    bytes_col: str = "content",
    size: tuple[int, int] = (224, 224),
    fake: bool = False,
) -> DataFrame:
    """Re-encode images at a target size (PIL path), or pass bytes
    through with the target shape recorded (stub path)."""
    pil = _try_pil()
    if pil is None and not fake:
        raise NotImplementedError("image codec (PIL) not available; pass fake=True")
    h, w = size

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("resized", T.BinaryType()),
            T.StructField("resized_shape", T.ArrayType(T.IntegerType())),
        ]
    )

    def run(iterator: Iterator):
        import io

        for pdf in iterator:
            resized, shapes = [], []
            for data in pdf[bytes_col]:
                raw = bytes(data) if data is not None else b""
                if pil is not None and not fake:
                    with pil.open(io.BytesIO(raw)) as img:
                        buf = io.BytesIO()
                        img.resize((w, h)).save(buf, format=img.format or "PNG")
                        resized.append(buf.getvalue())
                else:
                    resized.append(raw)  # stub: bytes unchanged
                shapes.append([h, w, 3])
            pdf = pdf.copy()
            pdf["resized"] = resized
            pdf["resized_shape"] = shapes
            yield pdf

    return df.mapInPandas(run, out_schema)


def extract_image_features(
    df: DataFrame,
    bytes_col: str = "content",
    dim: int = 16,
) -> DataFrame:
    """Deterministic byte-level feature vector (chunked byte histograms,
    L2-normalized) — a stand-in embedding with real Spark plumbing; swap
    the kernel for a model forward pass on a GPU cluster."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def run(iterator: Iterator):
        import numpy as np

        for pdf in iterator:
            feats = []
            for data in pdf[bytes_col]:
                raw = np.frombuffer(bytes(data) if data is not None else b"\0", dtype=np.uint8)
                hist = np.zeros(dim, dtype=np.float64)
                if raw.size:
                    bins = np.bincount(raw % dim, minlength=dim).astype(np.float64)
                    norm = np.linalg.norm(bins)
                    hist = bins / (norm if norm else 1.0)
                feats.append([float(x) for x in hist])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, out_schema)


def sample_video_frames(
    df: DataFrame,
    bytes_col: str = "content",
    every_n: int = 30,
    fake: bool = False,
) -> DataFrame:
    """1-in-N-out frame sampling (UDTF shape).  Real path needs ``av``
    (not installed → NotImplementedError); the stub emits deterministic
    frame records so downstream pipelines are testable."""
    try:
        import av  # type: ignore  # noqa: F401

        have_av = True
    except ImportError:
        have_av = False
    if not have_av and not fake:
        raise NotImplementedError("video codec (av) not available; pass fake=True")

    out_schema = T.StructType([
        T.StructField("source_row", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_checksum", T.StringType()),
    ])

    id_col = "_row_id" if "_row_id" in df.columns else None

    def run(iterator: Iterator):
        import pandas as pd

        for pdf in iterator:
            rows = []
            for i, data in enumerate(pdf[bytes_col]):
                raw = bytes(data) if data is not None else b""
                src = int(pdf[id_col].iloc[i]) if id_col else i
                # stub: pretend the clip has len(raw) % 121 frames
                n_frames = (len(raw) % 121) + 1
                for fi in range(0, n_frames, every_n):
                    chunk = raw[fi::max(n_frames, 1)]
                    rows.append({
                        "source_row": src,
                        "frame_index": fi,
                        "frame_checksum": hashlib.md5(chunk).hexdigest(),
                    })
            if rows:
                yield pd.DataFrame(rows)

    return df.mapInPandas(run, out_schema)


def _try_soundfile():
    try:
        import soundfile  # type: ignore

        return soundfile
    except ImportError:
        return None


AUDIO_META_SCHEMA = T.StructType([
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("duration_s", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("checksum", T.StringType()),
])


def _fake_audio_decode(data: bytes) -> tuple[int, int, int, float, float, str]:
    """Deterministic fake audio decode: pseudo rate/length/loudness +
    content checksum (same role as ``_fake_decode`` for images)."""
    digest = hashlib.md5(data or b"").digest()
    rate = (8000, 16000, 22050, 44100)[digest[0] % 4]
    n = 1000 + int.from_bytes(digest[1:3], "big")
    channels = 1 + digest[3] % 2
    rms = round(digest[4] / 255.0, 6)
    return rate, n, channels, round(n / rate, 6), rms, digest.hex()


def extract_audio_features(
    df: DataFrame,
    bytes_col: str = "content",
    fake: bool = False,
) -> DataFrame:
    """Append decoded audio metadata + features (sample_rate, n_samples,
    channels, duration, RMS loudness, checksum).  Real path uses
    ``soundfile`` when importable; otherwise ``fake=True`` runs the
    deterministic stub and ``fake=False`` raises NotImplementedError
    (reference decodes audio lazily through ``muller.read`` samples,
    ``muller/api/read.py:21``, ``core/sample.py``)."""
    sf = _try_soundfile()
    if sf is None and not fake:
        raise NotImplementedError(
            "audio codec (soundfile) not available in this environment; "
            "pass fake=True for the deterministic stub decode"
        )

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("audio_meta", AUDIO_META_SCHEMA)]
    )

    def run(iterator: Iterator):
        import io

        for pdf in iterator:
            metas = []
            for data in pdf[bytes_col]:
                raw = bytes(data) if data is not None else b""
                if sf is not None and not fake:
                    try:
                        wav, rate = sf.read(io.BytesIO(raw))
                        n = int(wav.shape[0])
                        ch = int(wav.shape[1]) if wav.ndim > 1 else 1
                        rms = float((wav.astype("float64") ** 2).mean() ** 0.5)
                        metas.append((
                            int(rate), n, ch, round(n / rate, 6), round(rms, 6),
                            hashlib.md5(raw).hexdigest(),
                        ))
                        continue
                    except Exception:
                        metas.append((None, None, None, None, None, None))
                        continue
                metas.append(_fake_audio_decode(raw))
            pdf = pdf.copy()
            pdf["audio_meta"] = [
                {
                    "sample_rate": m[0], "n_samples": m[1], "channels": m[2],
                    "duration_s": m[3], "rms": m[4], "checksum": m[5],
                }
                for m in metas
            ]
            yield pdf

    return df.mapInPandas(run, out_schema)
