"""Round-14 probe: six-branch vs fused-single-pass multimodal plans at sf10."""
import time, json, sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from scanner_spark.session import get_spark
from scanner_spark.deploy import ship
from scanner_spark.io import read_table
from scanner_spark.functions import multimodal
from scanner_spark.queries import _frame_checksum_udf, QUERIES

SF = "/root/repo/.bench_data/sf10"
spark = get_spark("mmprobe", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
ship(spark)

def old_decode():
    d = read_table(spark, SF, "documents")
    md = F.col("doc_id") % 6
    png = multimodal.text_to_png(d.filter(md == 0), "text", 32, 32)
    jpg = multimodal.text_to_jpeg(d.filter(md == 1), "text", 32, 32)
    gif = multimodal.text_to_gif(d.filter(md == 2), "text", 32, 32)
    wbp = multimodal.text_to_webp(d.filter(md == 3), "text", 32, 32)
    tif = multimodal.text_to_tiff(d.filter(md == 4), "text", 32, 32)
    jpp = multimodal.text_to_jpeg(d.filter(md == 5), "text", 32, 32, progressive=True)
    frames = multimodal.decode_image(
        png.unionByName(jpg).unionByName(gif).unionByName(wbp)
        .unionByName(tif).unionByName(jpp), 16, 16)
    cks = _frame_checksum_udf()
    return frames.select("asset_id", cks(F.col("frame")).alias("c"))

def new_decode():
    return QUERIES["multimodal_decode"](spark, SF)

def old_audio():
    d = read_table(spark, SF, "documents")
    wav = multimodal.synth_audio(d.filter(F.col("doc_id") % 2 == 0))
    flc = multimodal.synth_audio(d.filter(F.col("doc_id") % 2 == 1), codec="flac")
    return multimodal.audio_feature_table(wav.unionByName(flc))

def new_audio():
    return QUERIES["multimodal_audio"](spark, SF)

res = {}
for name, fn in (("decode_old", old_decode), ("decode_new", new_decode),
                 ("audio_old", old_audio), ("audio_new", new_audio),
                 ("decode_old2", old_decode), ("decode_new2", new_decode),
                 ("audio_old2", old_audio), ("audio_new2", new_audio)):
    t0 = time.time()
    n = fn().count()
    res[name] = round(time.time() - t0, 1)
    print(name, res[name], "rows", n, flush=True)
print(json.dumps(res))
