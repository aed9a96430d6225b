"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

Design (the part that matters at 100 TB and IS real and tested here):

- Payloads live in a ``binary`` column next to typed metadata columns
  (modality, byte size, digest, decode status) — one row per asset,
  partitionable/prunable like any other column; Parquet stores the bytes
  untouched.
- Heavy per-asset work (decode, resize, frame-sample, feature-extract)
  runs as Arrow-batched ``mapInPandas`` over the binary column: batch in,
  batch out, bounded memory via ``maxRecordsPerBatch``, no driver
  involvement, no shuffle (pure map). Repartition upstream to spread
  assets evenly — asset size skew, not count skew, is the failure mode.

The decode kernels themselves are STUBBED (image/audio libraries are not
in this environment): ``decode_stub`` emits deterministic fake features
and marks ``decode_status='stubbed'``; swapping in a real decoder changes
only the inner function body, none of the Spark plumbing, schema, or
partitioning. That swap point is marked NotImplementedError-adjacent
below.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest_md5", T.StringType()),
        T.StructField("decode_status", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def binary_assets(df: DataFrame, id_col: str, payload_col: str, modality: str) -> DataFrame:
    """Normalize any source into the multimodal asset shape:
    (asset_id, modality, payload binary, n_bytes, digest_md5).
    Metadata derives JVM-side (octet_length/md5 over binary)."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("digest_md5"),
    )


_KNOWN_MODALITIES = {"image", "audio", "video", "text"}

# -- decoder registry (VERDICT r5 task 8) ----------------------------------
# Real decoders self-register when their library exists in the
# environment; otherwise the deterministic stub serves the modality.
# ``extract_features`` snapshots the registry into the Arrow closure, so
# a decoder registered at plan time reaches the executors by value — no
# reliance on worker-side module state.
_DECODERS: dict[str, object] = {}


def register_decoder(modality: str, fn) -> None:
    """Register ``fn(payload: bytes) -> list[float]`` as the real decoder
    for ``modality``. Raising inside ``fn`` marks the row
    ``decode_error`` and falls back to the stub feature — one bad asset
    never kills a 100 TB batch."""
    if modality not in _KNOWN_MODALITIES:
        raise ValueError(f"unknown modality {modality!r}")
    _DECODERS[modality] = fn


def unregister_decoder(modality: str) -> None:
    _DECODERS.pop(modality, None)


def decoder_capabilities() -> dict[str, str]:
    """Per-modality decode path currently in effect."""
    return {
        m: ("registered" if m in _DECODERS else "stubbed")
        for m in sorted(_KNOWN_MODALITIES)
    }


def _probe_optional_decoders() -> None:
    """Auto-register real decoders for whichever optional libraries the
    environment actually has; absent libraries leave the stub in place
    (probed once at import — cheap, import-error-safe)."""
    try:
        import io

        from PIL import Image

        def _pil_image(payload: bytes) -> list[float]:
            im = Image.open(io.BytesIO(payload)).convert("L").resize((8, 1))
            return [round(p / 255.0, 6) for p in im.getdata()]

        register_decoder("image", _pil_image)
    except ImportError:
        pass
    try:
        import io

        import numpy as _np
        import soundfile as _sf

        def _sf_audio(payload: bytes) -> list[float]:
            data, _rate = _sf.read(io.BytesIO(payload))
            mono = _np.asarray(data, dtype="float64").reshape(len(data), -1).mean(axis=1)
            chunks = _np.array_split(mono, 8) if len(mono) else []
            return [round(float(_np.abs(c).mean()) if len(c) else 0.0, 6) for c in chunks]

        register_decoder("audio", _sf_audio)
    except ImportError:
        pass


_probe_optional_decoders()


def _stub_feature(payload: bytes) -> list[float]:
    # deterministic fake: byte-histogram moments, length-normalized
    n = max(len(payload), 1)
    buckets = [0.0] * 8
    for b in payload[:4096]:
        buckets[b & 7] += 1.0
    return [round(x / min(n, 4096), 6) for x in buckets]


def _decode_kernel(
    payload: bytes, modality: str, decoders: dict | None = None
) -> tuple[str, list[float]]:
    """Per-asset decode -> feature vector.

    Dispatches to the registered real decoder when one exists; the
    deterministic stub otherwise exercises the full pipeline shape
    (schema, batch flow, determinism) so swapping in a real decoder
    changes no Spark plumbing. Unknown modalities fail loudly."""
    if modality not in _KNOWN_MODALITIES:
        raise NotImplementedError(f"no decoder registered for modality {modality!r}")
    decoders = _DECODERS if decoders is None else decoders
    fn = decoders.get(modality)
    if fn is not None:
        try:
            return "decoded", fn(payload)
        except Exception:
            return "decode_error", _stub_feature(payload)
    return "stubbed", _stub_feature(payload)


def extract_features(assets: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each Arrow batch of (asset_id, modality, payload, …)
    yields a feature batch — the canonical Spark shape for per-asset
    Python work. Bound batch memory with
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` when assets are
    large."""
    import pandas as pd  # noqa: F401 (Arrow batch interface)

    decoders = dict(_DECODERS)  # snapshot: ships to executors by value

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            status_feats = [
                _decode_kernel(bytes(p) if p is not None else b"", m, decoders)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            out = pdf[["asset_id", "modality", "n_bytes", "digest_md5"]].copy()
            out["decode_status"] = [s for s, _ in status_feats]
            out["feature"] = [f for _, f in status_feats]
            yield out

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_md5", T.StringType()),
        T.StructField("decode_status", T.StringType()),
    ]
)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: each VIDEO asset yields ``n_frames`` rows — the
    1->N mapInPandas shape (an Arrow batch of assets in, a LARGER batch
    of frames out; no explode shuffle, no driver involvement). Non-video
    assets produce no rows.

    STUB kernel: a real implementation seeks the container's keyframes
    (libav); the deterministic fake slices the payload into equal spans
    so frame count, ordering, per-frame digests and batch flow are fully
    exercised. Swap only the inner loop to productionize."""
    import hashlib

    import pandas as pd  # noqa: F401

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for aid, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "video":
                    continue
                raw = bytes(payload) if payload is not None else b""
                span = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    frame = raw[i * span : (i + 1) * span]
                    rows.append(
                        (aid, i, n_frames, frame,
                         hashlib.md5(frame).hexdigest(), "stubbed")
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest_md5", T.StringType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("decode_status", T.StringType()),
    ]
)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize: the 1->1 payload-transform mapInPandas shape (binary in,
    binary out, metadata recomputed batch-side). STUB kernel: a real
    implementation decodes + re-encodes (PIL); the deterministic fake
    bounds the payload to width*height bytes so downstream size
    accounting, digests and schema are exercised. Only image assets are
    transformed; other modalities pass through untouched (status
    'passthrough')."""
    import hashlib

    import pandas as pd  # noqa: F401

    cap = width * height

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for aid, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                if modality == "image":
                    out, status = raw[:cap], "stubbed"
                else:
                    out, status = raw, "passthrough"
                rows.append(
                    (aid, modality, out, len(out),
                     hashlib.md5(out).hexdigest(), width, height, status)
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return assets.mapInPandas(run, schema=RESIZED_SCHEMA)
