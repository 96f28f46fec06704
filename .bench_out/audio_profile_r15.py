"""Round-15 post-chain reconnaissance, audio side: where does
multimodal_audio's ~41-53 s (sf10, single-sample chain rows) go?

Single-core micro-bench of the audio codec kernels on the query's own
payload shapes (sawtooth, n = 1000..1600 samples, half PCM / half
FLAC), 500 reps each: encode_wav / decode_wav / encode_flac /
decode_flac, plus the feature pass.  No Spark, no product changes —
ranks the next lever the way mm_profile_r15.py did for images (verdict
there: JPEG entropy/DCT ~68 % of codec CPU).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from scanner_spark.kernels.audio import decode_wav, encode_wav
from scanner_spark.kernels.flac import decode_flac, encode_flac

RATE = 8000
REPS = 500


def clip(did: int) -> np.ndarray:
    p = did % 50 + 2
    n = 1000 + (did % 7) * 100
    i = np.arange(n, dtype=np.int64)
    return ((((i * p) % 256) - 128) * 64).astype(np.int16)


def bench(fn, *a):
    t0 = time.perf_counter()
    for _ in range(REPS):
        fn(*a)
    return round((time.perf_counter() - t0) / REPS * 1e6, 1)  # us/clip


out = {}
# representative clips across the id distribution
clips = [clip(d) for d in range(14)]
s = clips[3]
wav, flac = encode_wav(s, RATE), encode_flac(s, RATE)
out["one_clip_us"] = {
    "encode_wav": bench(encode_wav, s, RATE),
    "decode_wav": bench(decode_wav, wav),
    "encode_flac": bench(encode_flac, s, RATE),
    "decode_flac": bench(decode_flac, flac),
}
# spread across shapes (period/length vary cost, esp. FLAC model choice)
enc_f = [bench(encode_flac, c, RATE) for c in clips]
dec_f = [bench(decode_flac, encode_flac(c, RATE)) for c in clips]
out["flac_encode_us_by_id"] = enc_f
out["flac_decode_us_by_id"] = dec_f

# extrapolation: 500k clips at sf10, ids uniform, half FLAC / half PCM,
# 32 workers
mean_ef, mean_df = float(np.mean(enc_f)), float(np.mean(dec_f))
ew, dw = out["one_clip_us"]["encode_wav"], out["one_clip_us"]["decode_wav"]
n, workers = 500_000, 32
est = (0.5 * (mean_ef + mean_df) + 0.5 * (ew + dw)) * n / workers / 1e6
out["sf10_est_codec_seconds_on_32_cores"] = round(est, 1)
out["flac_share_pct"] = round(
    100 * 0.5 * (mean_ef + mean_df)
    / (0.5 * (mean_ef + mean_df) + 0.5 * (ew + dw)), 1)
print(json.dumps(out, indent=1))
