"""Multimodal columns: opaque binary payloads + typed metadata.

Design for interleaved text+media documents (BASELINE.json input_hint):
media stays an opaque ``binary`` column (or a ``media_ref`` pointer into
a blob store) with a typed metadata struct beside it; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages over bucketed partitions.

This container ships no image/audio libraries, so the decode step is a
STUB: with PIL/soundfile importable the real decoder runs; otherwise a
clearly-marked deterministic fake derives "features" from the payload
digest. Everything Spark-side — schema, partitioning, UDF signature,
batch shape — is real and tested; swapping the stub for a real decoder
changes no plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = (
    "doc_id long, media_kind string, n_bytes long, digest string, "
    "width int, height int, n_frames int, feature array<float>, "
    "decoder string"
)


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, feature) via PIL — NotImplemented without it."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow (not in this container); "
            "callers fall back to the deterministic digest-derived stub"
        ) from e
    import io

    import PIL.Image as Image

    img = Image.open(io.BytesIO(payload))
    arr = np.asarray(img, dtype=np.float32)
    feat = arr.mean(axis=tuple(range(arr.ndim - 1))) if arr.ndim > 1 else arr
    return img.width, img.height, feat[:8].astype(np.float32)


def _stub_features(digests: list[bytes], dim: int = 8) -> np.ndarray:
    """Deterministic FAKE features from payload digests (decoder absent).
    Clearly synthetic: derived from sha256, NOT pixel data."""
    out = np.zeros((len(digests), dim), dtype=np.float32)
    for i, d in enumerate(digests):
        h = np.frombuffer(d[: dim * 4], dtype=np.uint32).astype(np.float32)
        out[i] = h / np.float32(2**32)
    return out


def media_features(
    df: DataFrame,
    payload_col: str = "payload",
    kind_col: str = "media_kind",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> DataFrame:
    """Binary payloads → typed media feature rows.

    Partitioning: repartition by a payload-size-agnostic bucket of the id
    so decode work (the expensive step at 100 TB) spreads evenly
    regardless of how the docs table is laid out.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            payloads = [bytes(b) if b is not None else b"" for b in pdf[payload_col]]
            digests = [hashlib.sha256(p).digest() for p in payloads]
            widths = np.zeros(n, dtype=np.int32)
            heights = np.zeros(n, dtype=np.int32)
            frames = np.ones(n, dtype=np.int32)
            stub = _stub_features(digests)
            feats = stub.copy()
            decoder = "stub-sha256"
            try:
                # per-payload decode: capture (w, h, feat); a corrupt
                # payload falls back to the stub for THAT row only
                # instead of failing the whole task
                for i, p in enumerate(payloads):  # pragma: no cover - PIL
                    try:
                        w, h, f = decode_image(p)
                        widths[i], heights[i] = w, h
                        k = min(len(f), feats.shape[1])
                        feats[i, :k] = f[:k]
                    except NotImplementedError:
                        raise
                    except Exception:  # noqa: BLE001 - corrupt payload
                        pass  # row keeps stub features + 0x0 dims
                decoder = "pil"
            except NotImplementedError:
                pass  # no PIL in container: all rows keep the stub
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "media_kind": pdf[kind_col].to_numpy(),
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [d.hex() for d in digests],
                    "width": widths,
                    "height": heights,
                    "n_frames": frames,
                    "feature": [f for f in feats],
                    "decoder": decoder,
                }
            )

    return (
        df.repartition(buckets, F.pmod(F.xxhash64(id_col), F.lit(buckets)))
        .select(id_col, kind_col, payload_col)
        .mapInPandas(fn, MEDIA_FEATURES_SCHEMA)
    )
