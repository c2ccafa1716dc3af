"""Multimodal column plumbing (task-brief extension): image/audio/video
as opaque ``binary`` columns with typed metadata, processed through
Arrow-batched ``mapInPandas`` — the UDF shape a real decode/feature
pipeline uses at 100 TB (one Python worker per partition, columnar
batches over Arrow, no per-row overhead).

The decode step itself is STUBBED (the container ships no image/audio
libraries): ``decode_image`` raises NotImplementedError by design, and
``extract_features`` defaults to a deterministic fake extractor so the
Spark-side plumbing — schema, batch iteration, partitioning — is real
and fully tested. Swapping in Pillow/torchaudio means replacing ONE
function; nothing in the plan changes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MULTIMODAL_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque payload
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "asset_id long, n_bytes int, first_byte int, last_byte int, feature_sum long"


def decode_image(content: bytes) -> "object":
    """STUB — real implementation needs an image library (Pillow/cv2)
    which this environment does not ship. The mapInPandas pipeline around
    it is real; swap this function to go live."""
    raise NotImplementedError(
        "image decode requires an image library not present in this environment"
    )


def fake_features(content: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for a feature extractor: byte-level stats.
    Exists so the distributed plumbing is testable end-to-end."""
    if content is None or len(content) == 0:
        return (0, -1, -1, 0)
    return (len(content), content[0], content[-1], int(sum(content[:64])))


def extract_features(
    df: DataFrame,
    extractor: Callable[[bytes], tuple[int, int, int, int]] = fake_features,
) -> DataFrame:
    """Arrow-batched feature extraction over binary content.

    Scale: mapInPandas processes whole Arrow record batches per Python
    worker; with N input partitions there are N parallel extractors and
    zero driver involvement. Repartition upstream to size batches to
    worker memory (binary payloads are large — fewer rows per batch)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            feats = [extractor(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": [f[0] for f in feats],
                    "first_byte": [f[1] for f in feats],
                    "last_byte": [f[2] for f in feats],
                    "feature_sum": [f[3] for f in feats],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: treat document text bytes as opaque
    binary assets (the testdata ships no real media)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


RESIZED_SCHEMA = (
    "asset_id long, content binary, width int, height int, n_bytes int"
)


def real_resize(content: bytes, width: int, height: int) -> bytes:
    """STUB — a real implementation decodes, resamples, and re-encodes
    (Pillow/cv2); neither library ships in this environment."""
    raise NotImplementedError(
        "image resize requires an image library not present in this environment"
    )


def fake_resize(content: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in: tile/truncate the payload to exactly
    width*height bytes — same output length contract as a real w x h
    single-channel re-encode, so downstream batch-shape logic is real."""
    need = width * height
    if not content:
        return bytes(need)
    reps = -(-need // len(content))
    return (content * reps)[:need]


def resize_assets(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Arrow-batched resize over binary image content (1 row in -> 1 row
    out, payload replaced). Same mapInPandas scale shape as
    extract_features: per-partition Python workers, no driver data."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            out = [resizer(c, width, height) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "content": out,
                    "width": width,
                    "height": height,
                    "n_bytes": [len(o) for o in out],
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)


PHASH_SCHEMA = "asset_id long, phash string, n_bytes int"


def perceptual_hash(
    df: DataFrame,
    grid_w: int = 9,
    grid_h: int = 8,
    resizer: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """dHash-style perceptual fingerprint over the resized byte grid —
    the image member of the dedup family (text has MinHash/SimHash/
    winnowing/n-gram; embeddings have sign-LSH/SemDeDup; images get
    this). Classic dHash (difference hash): resample to a
    grid_w x grid_h grayscale grid, emit one bit per horizontally
    adjacent pixel pair (left < right), giving (grid_w-1)*grid_h bits
    (9x8 -> the standard 64). Near-duplicate images — recompressions,
    small edits, watermarks — move few grid pixels and so few bits;
    Hamming distance over the hash is the dedup signal.

    The resample goes through ``resizer`` (fake_resize here: the
    container ships no image codecs — swapping in a real
    decode+resample is the same one-function swap as extract_features);
    the bit extraction itself is REAL dHash arithmetic and runs in the
    same Arrow-batched mapInPandas pass, so one Python worker per
    partition computes hash + resize together, no second pass over the
    (large) binary payloads.

    Pairs come from banding the returned ``phash`` exactly like SimHash
    (operators/dedup_text.simhash_near_pairs: pigeonhole segments ->
    equi-join, never all-pairs)."""
    n_bits = (grid_w - 1) * grid_h

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            hashes, sizes = [], []
            for c in pdf["content"]:
                g = resizer(c, grid_w, grid_h)
                bits = []
                for r in range(grid_h):
                    row = r * grid_w
                    for cx in range(grid_w - 1):
                        bits.append("1" if g[row + cx] < g[row + cx + 1] else "0")
                assert len(bits) == n_bits
                hashes.append("".join(bits))
                sizes.append(len(c) if c else 0)
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "phash": hashes, "n_bytes": sizes}
            )

    return df.mapInPandas(run, PHASH_SCHEMA)


FRAME_SCHEMA = "asset_id long, frame_idx int, ts_ms int, frame binary"


def real_frame_sample(content: bytes, every_ms: int, duration_ms: int) -> list[bytes]:
    """STUB — real frame extraction needs a video decoder (ffmpeg/av)."""
    raise NotImplementedError(
        "video frame sampling requires a video library not present in this environment"
    )


def fake_frame_sample(content: bytes, every_ms: int, duration_ms: int) -> list[bytes]:
    """Deterministic stand-in: one 16-byte slice per sampled timestamp,
    stride chosen from the payload — 1 row in -> N frame rows out, the
    fan-out shape a real sampler produces."""
    if not content or duration_ms <= 0:
        return []
    n = max(1, duration_ms // every_ms)
    step = max(1, len(content) // n)
    return [content[i * step : i * step + 16] for i in range(n)]


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    sampler: Callable[[bytes, int, int], list[bytes]] = fake_frame_sample,
) -> DataFrame:
    """Frame sampling for video assets: mapInPandas generator emitting a
    variable number of frame rows per input asset (Arrow batches in and
    out; the fan-out happens executor-side, never on the driver).

    Input needs columns (asset_id, content, meta.duration_ms)."""

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            durs = [m["duration_ms"] if m and m.get("duration_ms") else 0 for m in pdf["meta"]]
            for aid, content, dur in zip(pdf["asset_id"], pdf["content"], durs):
                for i, fr in enumerate(sampler(content, every_ms, int(dur))):
                    ids.append(aid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    frames.append(fr)
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return df.mapInPandas(run, FRAME_SCHEMA)
