"""Sources/sinks: stored tables (catalog), binary files, video columns.

Reference source/sink surface: scanner/engine/column_source.cpp,
column_sink.cpp, ingest.cpp; pluggable API scanner/api/source.h & sink.h.
"""

from scanner_spark.sources.video import (
    ingest_videos,
    load_frames,
    write_video,
)

__all__ = ["ingest_videos", "load_frames", "write_video"]
