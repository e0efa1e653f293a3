"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct — the same treatment the reference gives arbitrary
``Binary`` fields (reference JavaRecord2Schema.java:268-287: BINARY
raw with logical-type annotation). The Spark-side plumbing (schema,
partitioning, mapInArrow batch shapes, engine round-trip) is real;
the actual image/audio decoding libraries are not in this container,
so the pixel/sample decode step is STUBBED: ``decode_stub='fake'``
produces a deterministic byte-derived feature, ``decode_stub='raise'``
raises NotImplementedError where a real decoder (PIL/torchvision/
ffmpeg) would plug in.

MEDIA_SCHEMA:
    doc_id  string
    media   binary                      -- opaque payload (e.g. JPEG)
    meta    struct<kind string, width int, height int, n_bytes int>
    source  string
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("media", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
    ]), False),
    T.StructField("source", T.StringType(), False),
])

FEATURE_DIM = 16


def synth_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes are seeded
    pseudo-random with kind-dependent sizes (stands in for real JPEG/
    WAV bytes; the engine treats them as opaque either way)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n_rows)]
    sizes = np.where(kinds == "image", 256, np.where(kinds == "audio", 512, 1024))
    sizes = (sizes * (1 + rng.integers(0, 4, n_rows))).astype(np.int64)
    flat = rng.integers(0, 256, int(sizes.sum()), dtype=np.uint8)
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(sizes, out=offsets[1:])
    media = pa.Array.from_buffers(
        pa.binary(), n_rows,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat.tobytes())],
    )
    w = rng.integers(16, 257, n_rows).astype(np.int32)
    h = rng.integers(16, 257, n_rows).astype(np.int32)
    tbl = pa.table({
        "doc_id": pa.array([f"m{i:08d}" for i in range(n_rows)], pa.string()),
        "media": media,
        "meta": pa.StructArray.from_arrays(
            [pa.array(kinds.tolist(), pa.string()), pa.array(w), pa.array(h),
             pa.array(sizes.astype(np.int32))],
            fields=[
                pa.field("kind", pa.string(), nullable=False),
                pa.field("width", pa.int32(), nullable=False),
                pa.field("height", pa.int32(), nullable=False),
                pa.field("n_bytes", pa.int32(), nullable=False),
            ],
        ),
        "source": pa.array(np.where(rng.random(n_rows) < 0.7, "crawl", "curated").tolist()),
    })
    return spark.createDataFrame(tbl, schema=MEDIA_SCHEMA)


def extract_features(df: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """media -> fixed-dim feature vector, via mapInArrow over whole
    Arrow batches (the real plumbing: batch-shaped, vectorized, no
    per-row Python objects). The *decode* itself is stubbed."""
    out_ddl = f"doc_id string, kind string, feature array<float>"

    def fn(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            media = tbl.column("media").combine_chunks()
            kind = tbl.column("meta").combine_chunks().field(0)
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg — "
                    "not available in this container; plug the decoder "
                    "in here (input: Arrow binary array, output: "
                    f"(n, {FEATURE_DIM}) float32)"
                )
            # deterministic fake decode: histogram of payload bytes
            # folded to FEATURE_DIM bins, normalized — one scatter-add
            # over the whole flattened batch buffer, no per-row Python
            offs = np.frombuffer(media.buffers()[1], dtype=np.int32,
                                 count=len(media) + 1 + media.offset)[media.offset:]
            data = np.frombuffer(media.buffers()[2], dtype=np.uint8)
            bins = (np.arange(256) * FEATURE_DIM) // 256
            sizes = np.diff(offs.astype(np.int64))
            flat = data[offs[0]:offs[-1]]
            row_of_byte = np.repeat(np.arange(len(media)), sizes)
            counts = np.zeros((len(media), FEATURE_DIM), dtype=np.int64)
            np.add.at(counts, (row_of_byte, bins[flat]), 1)
            feats = (counts / np.maximum(sizes, 1)[:, None]).astype(np.float32)
            flat = pa.array(feats.reshape(-1), pa.float32())
            foffs = pa.array(
                np.arange(len(media) + 1, dtype=np.int32) * FEATURE_DIM,
                pa.int32(),
            )
            yield pa.RecordBatch.from_arrays(
                [tbl.column("doc_id").combine_chunks(),
                 kind,
                 pa.ListArray.from_arrays(foffs, flat)],
                names=["doc_id", "kind", "feature"],
            )

    return df.mapInArrow(fn, schema=out_ddl)
