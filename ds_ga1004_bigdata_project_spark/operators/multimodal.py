"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``modality`` tag and a ``map<string,string>`` metadata column. Decode /
feature-extraction / resize / frame-sample run as **Arrow-batched pandas
functions over mapInPandas** — the only sane shape for Python media libs at
scale: whole Arrow record batches cross the JVM↔Python boundary once, and the
work parallelizes per input partition with zero shuffle.

The media libraries themselves (PIL/ffmpeg/librosa) are NOT in this
container, so the actual byte→pixels decode is STUBBED (see
:func:`_decode_payload`): real modality decoding raises NotImplementedError
behind ``fake=False``, and the default deterministic fake derives features
from the raw bytes (hashes/lengths), keeping every piece of Spark-side
plumbing — schema, batching, partitioning, UDF signature — real and testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Canonical multimodal record schema.
PAYLOAD_SCHEMA = ("doc_id bigint, modality string, content binary, "
                  "meta map<string,string>")

FEATURE_SCHEMA = ("doc_id bigint, modality string, n_bytes bigint, "
                  "digest string, feature array<float>")

_MODALITIES = ("image", "audio", "video")


def attach_payload(documents: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Build a multimodal table from the documents fixture: the utf-8 bytes of
    the text stand in for an encoded media payload (deterministic), modality
    assigned round-robin by id. Real pipelines replace this with a parquet/
    tar-shard reader producing the same schema."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in _MODALITIES]),
        (F.col(id_col) % len(_MODALITIES) + 1).cast("int"))
    return documents.select(
        F.col(id_col).alias("doc_id"),
        modality.alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.create_map(F.lit("source"), F.col("source"),
                     F.lit("lang"), F.col("lang")).alias("meta"),
    )


def _decode_payload(content: bytes, modality: str, fake: bool) -> list[float]:
    """STUB decode. Real decoding (PIL.Image.open / soundfile / pyav frame
    sampling) is unavailable in this container; ``fake=True`` derives a
    deterministic 4-dim feature from the payload bytes so the distributed
    plumbing is fully exercisable."""
    if not fake:
        raise NotImplementedError(
            f"real {modality} decode requires media libraries not present in "
            "this environment; run with fake=True or install PIL/ffmpeg/librosa")
    h = hashlib.sha256(content).digest()
    return [b / 255.0 for b in h[:4]]


def extract_features(payloads: DataFrame, fake: bool = True,
                     batch_hint: int | None = None) -> DataFrame:
    """Feature extraction over ``mapInPandas``: one Python worker per input
    partition, Arrow batches in/out, no shuffle. Output is a typed feature
    row per payload (bytes, digest, feature vector).

    At 100 TB: repartition upstream so each task holds O(100 MB) of payloads;
    the stage is pure map — it scales linearly with executors."""
    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": content.map(len).astype("int64"),
                "digest": content.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "feature": [
                    _decode_payload(bytes(c), m, fake)
                    for c, m in zip(content, pdf["modality"])
                ],
            })

    return payloads.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_stub(payloads: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize operator signature (STUB — see module docstring): maps
    payload batches through a pandas fn that would call PIL; here it tags the
    intended transform in ``meta`` so pipelines can be wired and tested."""
    return payloads.withColumn(
        "meta",
        F.map_concat("meta", F.create_map(
            F.lit("resize"), F.lit(f"{width}x{height}"))))


def frame_sample_stub(payloads: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling signature (STUB): real impl would mapInPandas over
    pyav and EXPLODE each video into frame rows (1→N). The fake emits one
    deterministic 'frame' per payload keeping the 1→N explode shape."""
    frames = F.array(F.struct(F.lit(0).alias("frame_no"),
                              F.md5(F.col("content").cast("string")).alias("frame_digest")))
    return payloads.select(
        "doc_id", "modality",
        F.explode(frames).alias("frame"),
    ).select("doc_id", "modality", "frame.frame_no", "frame.frame_digest")
