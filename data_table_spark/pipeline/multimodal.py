"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, processed with Arrow-batched `mapInPandas`.

The reference has no media surface; this is the north-star extension.
The decode step is STUBBED (no PIL/ffmpeg in this container): passing
`decoder="real"` raises NotImplementedError at the call site, while the
default `decoder="fake"` derives deterministic pseudo-features from the
md5 of the bytes — so the Spark-side plumbing (schema, Arrow batch
shape, partitioning, UDF signature) is real, tested, and even
oracle-checkable (md5 is engine-portable).

Scale notes:
- media bytes never hit the driver; `mapInPandas` streams Arrow batches
  executor-side. Batch size is controlled by
  spark.sql.execution.arrow.maxRecordsPerBatch — size it so
  batch_rows * avg_media_bytes fits executor memory.
- feature extraction is a narrow map (no shuffle); downstream joins on
  the id column behave like any other DT join.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id bigint, media_type string, n_bytes bigint, content_md5 string,"
    " width int, height int"
)


def attach_binary(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    media_type: str = "image",
) -> DataFrame:
    """Synthesize a media table from the documents corpus: bytes =
    UTF-8(text). Stands in for `spark.read.format('binaryFile')` /
    parquet-with-binary ingestion, which yields the same shape:
    (id, media binary, media_type)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.encode(F.col(text_col), "UTF-8").alias("media"),
        F.lit(media_type).alias("media_type"),
    )


def _fake_decode(data: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decode: dimensions derived
    from the content hash. Engine-portable (md5)."""
    h = hashlib.md5(data).hexdigest()
    return 1 + int(h[:4], 16) % 512, 1 + int(h[4:8], 16) % 512


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Per-media features via mapInPandas (Arrow batches of rows with a
    bytes column; the decode loop runs executor-side, batch at a time).

    decoder="real" is the integration point for PIL/torchvision/ffmpeg —
    not available in this container, so it raises cleanly."""
    if decoder == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg; not in this container"
        )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            dims = [_fake_decode(b) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(b) for b in pdf["media"]],
                    "content_md5": [
                        hashlib.md5(b).hexdigest() for b in pdf["media"]
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "id bigint, media binary, width int, height int"


def resize_images(
    media: DataFrame, width: int, height: int, decoder: str = "fake"
) -> DataFrame:
    """Resize plumbing: real path would decode→resize→re-encode per Arrow
    batch. Fake path passes bytes through and stamps the target dims, so
    schema/partitioning behavior is exercised end-to-end."""
    if decoder == "real":
        raise NotImplementedError(
            "real media decoding requires PIL; not in this container"
        )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "media": pdf["media"],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 10, decoder: str = "fake"
) -> DataFrame:
    """Video frame-sampling plumbing: real path emits one row per kept
    frame (a flatMap — mapInPandas naturally yields more rows than
    input). Fake path emits deterministic frame stubs: ceil(n_bytes /
    (100*every_n)) frames per input."""
    if decoder == "real":
        raise NotImplementedError(
            "real video decoding requires ffmpeg; not in this container"
        )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, frames, data = [], [], []
            for i, b in zip(pdf["id"], pdf["media"]):
                n = max(1, len(b) // (100 * every_n))
                for f in range(n):
                    ids.append(i)
                    frames.append(f)
                    data.append(bytes(b[:16]))
            yield pd.DataFrame(
                {"id": ids, "frame_idx": frames, "frame": data}
            )

    return media.mapInPandas(
        batches, schema="id bigint, frame_idx int, frame binary"
    )
