"""Video columns: ingest-as-indexing + frame-exact decode pruning.

The one genuinely novel physical operator this engine adds over stock
Spark (SURVEY.md §4.3): reading sparse frame sets from GOP-structured
video without decoding everything.

Reference pipeline being reproduced:
- ingest builds a keyframe/sample index, never transcoding ("inplace",
  metadata.proto:107, ingest.cpp:310-365)  ->  ``ingest_videos`` here
  parses container headers via mapInPandas and writes a ``video_index``
  parquet table;
- at read time the scheduler groups requested frames into decode intervals
  split at non-adjacent keyframes (column_source.cpp:120-180, the
  ``load_sparsity_threshold`` heuristic rpc.proto:252)  ->  ``load_frames``
  computes the same plan as a DataFrame job: wanted-frames ⋈ video_index,
  assign each wanted frame its GOP's keyframe offset, group per
  (video, keyframe) into one decode task, then decode forward inside an
  Arrow-batched mapInPandas;
- the FrameColumn sink re-encodes (column_sink.cpp, compress_video
  op.py:57-102)  ->  ``write_video`` encodes per-stream SVF segments.

Scale notes: the index join broadcasts the wanted-frame spec (literal user
input); decode tasks are keyed by (video, gop) so a 1000-executor cluster
decodes GOPs embarrassingly parallel while each task reads only its GOP's
byte range — at 100 TB the scan cost is proportional to *wanted GOPs*, not
library size.  Each decode task performs bounded reads only (seek+read of
the GOP window plus the mp4 moov box — ``decode_gop_task``): the
object-store range-GET shape, enforced by a byte-counting test.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from scanner_spark.catalog import Database
from scanner_spark.sources import mp4, svf

VIDEO_INDEX_TABLE = "video_index"

INDEX_SCHEMA = (
    "video_path string, frame_no long, is_key boolean, offset long, size long, "
    "keyframe_no long, keyframe_offset long, "
    "height int, width int, channels int, gop int"
)

# ---------------------------------------------------------------------------
# storage openers: scheme -> open(path, "rb") factory.  The reference
# reads via storehouse's posix/GCS/S3 backends (python/scannerpy/
# source.py:24-37); here every read in ingest and decode goes through
# this registry, so an object-store client slots in per scheme without
# touching the planner.  The contract is the minimal seekable reader the
# byte-counting tests pin: .read(n), .seek(pos[, whence]), .tell(),
# context manager.  For s3://-style stores, implement read(n) as a
# range GET from the current position — decode tasks only ever do
# (sniff, moov walk, one GOP window) reads, so each task costs a handful
# of range requests regardless of object size.
# ---------------------------------------------------------------------------

_OPENERS: dict[str, object] = {"": open, "file": open}


def register_opener(scheme: str, opener) -> None:
    """Register ``opener(path, mode)`` for ``scheme://`` paths (executors
    must also register it — do so at module import in your job, or ship
    it via a broadcast-friendly module)."""
    _OPENERS[scheme] = opener


def opener_for(path: str):
    scheme = path.split("://", 1)[0] if "://" in path else ""
    try:
        return _OPENERS[scheme]
    except KeyError:
        raise ValueError(
            f"no storage opener registered for scheme {scheme!r} "
            f"(register_opener); known: {sorted(_OPENERS)}"
        ) from None


def ingest_videos(
    spark: SparkSession, db: Database, paths: Sequence[str]
) -> DataFrame:
    """Index containers (inplace — bits stay in the original files) and
    record the keyframe index in the catalog's ``video_index`` table.

    Container dispatch by sniffing: ISO-BMFF (``ftyp``) goes through the
    pure-Python mp4 box parser (index-only, no codec — the reference's
    inplace mode, ingest.cpp:310-365); anything else is SVF.  Both emit
    the same ``INDEX_SCHEMA`` rows."""
    files = spark.createDataFrame([(p,) for p in paths], "video_path string")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path in pdf["video_path"]:
                with opener_for(path)(path, "rb") as f:
                    buf = f.read()
                container = mp4 if mp4.is_mp4(buf) else svf
                meta, entries = container.parse_index(buf)
                key_no, key_off = 0, None
                for e in entries:
                    if e.is_key:
                        key_no, key_off = e.frame_no, e.offset
                    rows.append(
                        {
                            "video_path": path,
                            "frame_no": e.frame_no,
                            "is_key": e.is_key,
                            "offset": e.offset,
                            "size": e.size,
                            "keyframe_no": key_no,
                            "keyframe_offset": key_off,
                            **{k: meta[k] for k in ("height", "width", "channels", "gop")},
                        }
                    )
            yield pd.DataFrame(rows)

    idx = files.repartition(max(len(paths) // 4, 1)).mapInPandas(build, schema=INDEX_SCHEMA)
    if db.has_table(VIDEO_INDEX_TABLE):
        old = db.table(VIDEO_INDEX_TABLE).filter(~F.col("video_path").isin(list(paths)))
        idx = old.unionByName(idx)
    return db.write_table(VIDEO_INDEX_TABLE, idx, overwrite=True)


def load_frames(
    spark: SparkSession,
    db: Database,
    wanted: DataFrame | dict[str, Sequence[int]],
) -> DataFrame:
    """Frame-exact pruned decode.

    ``wanted``: {video_path: [frame_no, ...]} (literal) or a DataFrame
    (video_path, frame_no).  Returns (video_path, frame_no, frame, height,
    width, channels, dtype) — only the requested frames, decoding only the
    GOP byte ranges that contain them.
    """
    if isinstance(wanted, dict):
        rows = [(p, int(f)) for p, fs in wanted.items() for f in fs]
        wanted = spark.createDataFrame(rows, "video_path string, frame_no long")
        wanted = F.broadcast(wanted)
    index = db.table(VIDEO_INDEX_TABLE)

    # plan: each wanted frame -> its GOP keyframe; one decode task per
    # (video, keyframe_offset); the task's byte window is
    # [keyframe_offset, read_end) where read_end = end of the LAST wanted
    # frame's payload in the GOP — every intermediate delta frame lies
    # inside the window by the container's append order.  This mirrors the
    # reference's interval planning (column_source.cpp:120-180) and makes
    # the task's read a bounded range GET, not the whole object.
    plan = (
        index.join(wanted, ["video_path", "frame_no"], "inner")
        .groupBy("video_path", "keyframe_offset")
        .agg(
            F.collect_list("frame_no").alias("want_frames"),
            F.max(F.col("offset") + F.col("size")).alias("read_end"),
            F.first("height").alias("height"),
            F.first("width").alias("width"),
            F.first("channels").alias("channels"),
        )
    )

    out_schema = (
        "video_path string, frame_no long, frame binary, "
        "height int, width int, channels int, dtype string"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mp4_indices: dict[str, tuple] = {}  # one moov parse per file
        for pdf in batches:
            rows = {k: [] for k in ("video_path", "frame_no", "frame", "height", "width", "channels", "dtype")}
            for _, r in pdf.iterrows():
                path = r["video_path"]
                meta = {"height": r["height"], "width": r["width"], "channels": r["channels"]}
                decoded = decode_gop_task(
                    path,
                    int(r["keyframe_offset"]),
                    int(r["read_end"]),
                    meta,
                    set(int(x) for x in r["want_frames"]),
                    mp4_index_cache=mp4_indices,
                )
                for fno, arr in sorted(decoded.items()):
                    rows["video_path"].append(path)
                    rows["frame_no"].append(fno)
                    rows["frame"].append(arr.tobytes())
                    rows["height"].append(meta["height"])
                    rows["width"].append(meta["width"])
                    rows["channels"].append(meta["channels"])
                    rows["dtype"].append("u8")
            yield pd.DataFrame(rows)

    # one decode task per GOP — repartition spreads GOPs across executors
    return plan.repartition("video_path", "keyframe_offset").mapInPandas(
        decode, schema=out_schema
    )


def decode_gop_task(
    path: str,
    keyframe_offset: int,
    read_end: int,
    meta: dict,
    wanted: set[int],
    mp4_index_cache: dict | None = None,
    opener=None,
) -> dict[int, np.ndarray]:
    """One GOP decode task: bounded byte-range reads only (the 100 TB
    contract — an object-store range GET per GOP, never the whole file).

    Reads: an 8-byte container sniff, the moov box once per mp4 file
    (header boxes walked with seeks, mdat skipped — ``mp4.read_moov``),
    and the GOP payload window [keyframe_offset, read_end).  ``opener``
    defaults to the scheme registry (``register_opener`` — the
    storehouse-analog cloud hook) and is injectable so tests can count
    bytes read (test_video.py asserts reads <= GOP spans + index
    bytes)."""
    if opener is None:
        opener = opener_for(path)
    if mp4_index_cache is None:
        mp4_index_cache = {}
    with opener(path, "rb") as f:
        sniff = f.read(8)
        is_mp4 = mp4.is_mp4(sniff)
        if is_mp4 and path not in mp4_index_cache:
            mp4_index_cache[path] = mp4.parse_index(mp4.read_moov(path, opener=opener))
        f.seek(keyframe_offset)
        window = f.read(read_end - keyframe_offset)
    if is_mp4:
        return mp4.decode_range(
            window, keyframe_offset, meta, wanted,
            index=mp4_index_cache[path], base=keyframe_offset,
        )
    return svf.decode_range(window, keyframe_offset, meta, wanted, base=keyframe_offset)


def write_video(
    df: DataFrame,
    out_dir: str,
    gop: int = 8,
    stream_col: str = "video_path",
    frame_no_col: str = "frame_no",
    container: str = "svf",
    fps: int = 30,
) -> DataFrame:
    """FrameColumn sink: re-encode frame rows into video files, one per
    stream (compress_video analog; column_sink.cpp:278).  Returns a
    manifest DataFrame (stream, path, n_frames).

    ``container='svf'`` writes GOP-delta SVF segments; ``container='mp4'``
    writes a legal ISO-BMFF file with an uncompressed 'raw ' RGB24 track
    (every sample sync; ``gop`` is ignored) — the standard-container round
    trip: the file re-ingests through the mp4 box parser and decodes
    pixel-exactly via ``mp4.decode_range``.  ``container='avc1'`` writes
    REAL compressed H.264 from the in-repo baseline encoder
    (kernels/h264.py): an IDR every ``gop`` frames with P frames between
    (stss sync index) — lossy (quantized transform + 4:2:0 chroma),
    emitting only spec-verbatim VLC codes (see the h264 module's
    conformance posture), decoded keyframe-forward by
    ``mp4.decode_range``."""
    if container not in ("svf", "mp4", "avc1"):
        raise ValueError(f"unknown container {container!r}")
    os.makedirs(out_dir, exist_ok=True)
    out_schema = "stream string, path string, n_frames long"

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(frame_no_col)
        frames = [
            np.frombuffer(b, dtype=np.uint8).reshape(h, w, c)
            for b, h, w, c in zip(pdf["frame"], pdf["height"], pdf["width"], pdf["channels"])
        ]
        stream = str(key[0])
        safe = stream.replace(os.sep, "_").replace(":", "_")
        ext = "mp4" if container == "avc1" else container
        path = os.path.join(out_dir, f"{safe}.{ext}")
        if container == "mp4":
            data = mp4.encode_mp4_raw(frames, fps=fps)
        elif container == "avc1":
            data = mp4.encode_mp4_avc1(frames, fps=fps, gop=gop)
        else:
            data = svf.encode_svf(frames, gop=gop)
        with open(path, "wb") as f:
            f.write(data)
        return pd.DataFrame({"stream": [stream], "path": [path], "n_frames": [len(frames)]})

    return df.groupBy(stream_col).applyInPandas(encode, schema=out_schema)
