"""Video ingest + frame-exact decode pruning (reference semantics:
keyframe index ingest.cpp:310-365, sparse decode column_source.cpp:120-180,
decoder_automata_test.cpp).  The SVF container makes pruning *functionally*
checked: delta frames are wrong unless decode starts at the GOP keyframe."""

import os

import numpy as np
import pytest

from scanner_spark.catalog import Database
from scanner_spark.frames import synthetic_frame
from scanner_spark.sources import ingest_videos, load_frames, write_video
from scanner_spark.sources import svf

N_FRAMES, GOP, H, W, C = 40, 8, 12, 16, 3


def make_video(path: str, stream: int) -> list[np.ndarray]:
    frames = [synthetic_frame(stream, i, H, W, C) for i in range(N_FRAMES)]
    with open(path, "wb") as f:
        f.write(svf.encode_svf(frames, gop=GOP))
    return frames


@pytest.fixture()
def video_db(spark, tmp_path):
    db = Database(spark, str(tmp_path / "db"))
    paths, truth = [], {}
    for s in range(2):
        p = str(tmp_path / f"vid{s}.svf")
        truth[p] = make_video(p, s)
        paths.append(p)
    ingest_videos(spark, db, paths)
    return db, paths, truth


def test_svf_roundtrip_and_midgop_refusal():
    frames = [synthetic_frame(0, i, H, W, C) for i in range(N_FRAMES)]
    buf = svf.encode_svf(frames, gop=GOP)
    meta, entries = svf.parse_index(buf)
    assert meta["gop"] == GOP and len(entries) == N_FRAMES
    # decode from keyframe reproduces exact pixels across the GOP
    out = svf.decode_range(buf, entries[8].offset, meta, {8, 11, 15})
    for fno in (8, 11, 15):
        assert (out[fno] == frames[fno]).all()
    # entering mid-GOP must fail loudly (the property pruning must respect)
    with pytest.raises(ValueError, match="keyframe"):
        svf.decode_range(buf, entries[9].offset, meta, {9})


def test_ingest_builds_keyframe_index(video_db):
    db, paths, _ = video_db
    idx = db.table("video_index")
    assert idx.count() == 2 * N_FRAMES
    one = idx.filter(f"video_path = '{paths[0]}' and frame_no = 13").collect()[0]
    assert one.keyframe_no == 8 and not one.is_key
    keys = idx.filter("is_key").count()
    assert keys == 2 * (N_FRAMES // GOP)


def test_sparse_decode_exact_frames(spark, video_db):
    db, paths, truth = video_db
    wanted = {paths[0]: [0, 13, 14, 39], paths[1]: [25]}
    out = load_frames(spark, db, wanted).collect()
    got = {(r.video_path, r.frame_no): r for r in out}
    assert set(got) == {(paths[0], 0), (paths[0], 13), (paths[0], 14), (paths[0], 39), (paths[1], 25)}
    for (p, fno), r in got.items():
        arr = np.frombuffer(bytes(r.frame), dtype=np.uint8).reshape(H, W, C)
        assert (arr == truth[p][fno]).all(), f"pixel mismatch at {p}:{fno}"


def test_decode_plan_prunes_gops(spark, video_db):
    db, paths, _ = video_db
    # requesting 2 frames in one GOP must produce exactly 1 decode task row
    from pyspark.sql import functions as F

    wanted = spark.createDataFrame(
        [(paths[0], 9), (paths[0], 10)], "video_path string, frame_no long"
    )
    index = db.table("video_index")
    plan = (
        index.join(wanted, ["video_path", "frame_no"])
        .groupBy("video_path", "keyframe_offset")
        .count()
    )
    assert plan.count() == 1  # one GOP -> one decode interval


def test_video_sink_roundtrip(spark, video_db, tmp_path):
    db, paths, truth = video_db
    frames = load_frames(spark, db, {paths[0]: list(range(N_FRAMES))})
    manifest = write_video(frames, str(tmp_path / "out"), gop=4).collect()
    assert len(manifest) == 1 and manifest[0].n_frames == N_FRAMES
    with open(manifest[0].path, "rb") as f:
        buf = f.read()
    meta, entries = svf.parse_index(buf)
    assert meta["gop"] == 4
    out = svf.decode_range(buf, entries[0].offset, meta, set(range(N_FRAMES)))
    for i in range(N_FRAMES):
        assert (out[i] == truth[paths[0]][i]).all()
