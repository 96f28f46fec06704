#!/usr/bin/env python
"""Post-chain adjudication probe for the multimodal_decode sf10 regression:
times the SHIPPED query vs a variant without the query-level explicit
repartition (read_table's guarded heal already supplies the exchange).
Two passes each, min."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from scanner_spark.session import get_spark  # noqa: E402
from scanner_spark.io import read_table  # noqa: E402
from scanner_spark import queries as Q  # noqa: E402
from scanner_spark.deploy import ship  # noqa: E402


def variant_noextra(spark, sf_dir):
    """q_multimodal_decode minus the query-level repartition (the
    read_table heal already spreads the scan)."""
    ship(spark)
    from scanner_spark.functions import multimodal

    d = read_table(spark, sf_dir, "documents")
    md = F.col("doc_id") % 6
    png = multimodal.text_to_png(d.filter(md == 0), "text", 32, 32)
    jpg = multimodal.text_to_jpeg(d.filter(md == 1), "text", 32, 32)
    gif = multimodal.text_to_gif(d.filter(md == 2), "text", 32, 32)
    wbp = multimodal.text_to_webp(d.filter(md == 3), "text", 32, 32)
    tif = multimodal.text_to_tiff(d.filter(md == 4), "text", 32, 32)
    jpp = multimodal.text_to_jpeg(d.filter(md == 5), "text", 32, 32,
                                  progressive=True)
    frames = multimodal.decode_image(
        png.unionByName(jpg).unionByName(gif).unionByName(wbp)
        .unionByName(tif).unionByName(jpp),
        16, 16,
    )
    cks = Q._frame_checksum_udf()
    lossy = (F.col("asset_id") % 6).isin(1, 5)
    out = frames.select(
        "asset_id", "height", "width", "channels",
        cks(F.col("frame")).alias("c"),
    )
    return out.select(
        "asset_id", "height", "width", "channels",
        F.when(lossy, F.lit(None).cast("bigint")).otherwise(
            F.col("c.pix_sum")).alias("pix_sum"),
        F.when(lossy, F.lit(None).cast("bigint")).otherwise(
            F.col("c.pix_wsum")).alias("pix_wsum"),
    )


def main():
    sf_dir = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = get_spark("mmd-probe")
    spark.sparkContext.setLogLevel("ERROR")
    read_table(spark, sf_dir, "documents").limit(1).collect()
    timings = {}
    for _ in range(passes):
        for name, fn in (
            ("shipped", lambda s, d: Q.QUERIES["multimodal_decode"](s, d)),
            ("noextra", variant_noextra),
        ):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings.setdefault(name, []).append(
                round(time.monotonic() - t0, 2))
    print(json.dumps({k: {"min": min(v), "all": v}
                      for k, v in timings.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
