"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the LLM-pipeline extensions) as (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` gives the DuckDB-runnable ANSI SQL twin for each —
value-hash parity is locally enforced by tests/test_entry_parity.py, which
replicates the driver's sorted-column/sorted-row compare.

Cross-engine determinism notes live in scanner_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scanner_spark.functions.hashing import MINHASH_P, h60_sql, minhash_coeffs  # noqa: E402
from scanner_spark.functions.text import LANG_STOPWORDS  # noqa: E402
from scanner_spark.functions import pii as pii_fns  # noqa: E402
from scanner_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary on /root/testdata/sf0.001."""
    return Q.q_tpch_q1(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

# events as a Scanner-model stream (same definition as queries.events_stream)
_ST = """
st AS (
  SELECT event_type AS stream_id,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY event_id) - 1 AS BIGINT) AS idx,
         event_id, value
  FROM events
)
"""

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"


def _pii_seeded_sql() -> str:
    """The oracle's deterministic PII seeding — mirrors q_doc_pii_scrub."""
    return """
seeded AS (
  SELECT doc_id,
    text || ' contact u' || CAST(doc_id AS VARCHAR) || '@ex.com'
    || CASE WHEN doc_id % 3 = 0 THEN ' ssn '
         || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
         || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
    || CASE WHEN doc_id % 2 = 0 THEN ' ip 10.'
         || CAST(doc_id % 256 AS VARCHAR) || '.0.'
         || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' tel +1 555 '
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
    AS seeded
  FROM documents
)"""


def _kmeans_sql(k: int, dim: int, iters: int) -> str:
    """Unrolled Lloyd iterations as chained CTEs — the same rounded-update
    determinism contract as functions.cluster.kmeans (see its docstring)."""
    dvec = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
    # dim is taken from each row's own vector (len(e.v)), not a literal —
    # the oracle adapts to the data like the Spark side does (ADVICE r05);
    # the `dim` arg only sizes the centroid-update unnest.
    sq = (
        "list_sum(list_transform(generate_series(1, len(e.v)), "
        "i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i])))"
    )
    parts = [
        f"ev AS (SELECT vec_id, {dvec} AS v FROM embeddings)",
        f"""cents0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS c
  FROM (SELECT vec_id, v FROM ev ORDER BY vec_id LIMIT {k})
)""",
    ]
    for it in range(iters):
        parts.append(
            f"""assign{it} AS (
  SELECT e.vec_id, c.cid, {sq} AS dist
  FROM ev e CROSS JOIN cents{it} c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY dist, c.cid) = 1
)"""
        )
        parts.append(
            f"""upd{it + 1} AS (
  SELECT a.cid, g.i, round(avg(e.v[g.i]), 6) AS val
  FROM assign{it} a JOIN ev e ON a.vec_id = e.vec_id
  CROSS JOIN (SELECT unnest(generate_series(1,
    (SELECT max(len(v)) FROM ev))) AS i) g
  GROUP BY a.cid, g.i
)"""
        )
        parts.append(
            f"""cents{it + 1} AS (
  SELECT c0.cid, COALESCE(u.c, c0.c) AS c
  FROM cents{it} c0 LEFT JOIN
    (SELECT cid, list(val ORDER BY i) AS c FROM upd{it + 1} GROUP BY cid) u
  ON c0.cid = u.cid
)"""
        )
    parts.append(
        f"""final AS (
  SELECT e.vec_id, c.cid, {sq} AS dist
  FROM ev e CROSS JOIN cents{iters} c
  QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY dist, c.cid) = 1
)"""
    )
    return "WITH " + ",\n".join(parts)

def _pq_sql(m: int = 8, ksub: int = 16, iters: int = 5, sample: int = 2048,
            k: int = 5) -> str:
    """Unrolled product-quantization ANN twin (simsearch.pq_train /
    pq_encode / knn_pq_adc): per-subspace rounded-Lloyd codebook training
    on the ``sample`` lowest-id vectors, nearest-code encoding of the
    corpus, ADC table-lookup scoring for the vec_id=0 query.  The
    subspace index j is ordinary data, so all m codebooks train in ONE
    unrolled iteration chain.  Distances are the same sequential
    left-to-right fold the Spark side now uses; means round to 6 decimals
    HALF_UP; the final ADC sum folds subspaces in j order via
    list_sum(list(d ORDER BY j)) — bit-identical to the Python j-loop."""
    sd = (
        "list_sum(list_transform(generate_series(1, len({s})), "
        "i -> ({s}[i] - {c}[i]) * ({s}[i] - {c}[i])))"
    )
    parts = [
        "ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM embeddings)",
        f"samp AS (SELECT vec_id, v FROM ev ORDER BY vec_id LIMIT {sample})",
        f"dims AS (SELECT CAST(max(len(v)) // {m} AS INTEGER) AS dsub FROM ev)",
        f"""sv AS (
  SELECT s.vec_id, r.j, list_slice(s.v, r.j * d.dsub + 1, (r.j + 1) * d.dsub) AS s
  FROM samp s, range(0, {m}) r(j), dims d
)""",
        f"""pc0 AS (
  SELECT j, CAST(rn - 1 AS INTEGER) AS cid, s AS c FROM (
    SELECT j, s, row_number() OVER (PARTITION BY j ORDER BY vec_id) AS rn FROM sv
  ) WHERE rn <= {ksub}
)""",
    ]
    for it in range(iters):
        parts.append(
            f"""pa{it} AS (
  SELECT s.vec_id, s.j, c.cid, {sd.format(s='s.s', c='c.c')} AS dist
  FROM sv s JOIN pc{it} c ON s.j = c.j
  QUALIFY row_number() OVER (PARTITION BY s.vec_id, s.j ORDER BY dist, c.cid) = 1
)"""
        )
        parts.append(
            f"""pu{it + 1} AS (
  SELECT a.j, a.cid, g.i, round(avg(s.s[g.i]), 6) AS val
  FROM pa{it} a JOIN sv s ON a.vec_id = s.vec_id AND a.j = s.j
  CROSS JOIN (SELECT unnest(generate_series(1, (SELECT dsub FROM dims))) AS i) g
  GROUP BY a.j, a.cid, g.i
)"""
        )
        parts.append(
            f"""pc{it + 1} AS (
  SELECT c0.j, c0.cid, COALESCE(u.c, c0.c) AS c
  FROM pc{it} c0 LEFT JOIN
    (SELECT j, cid, list(val ORDER BY i) AS c FROM pu{it + 1} GROUP BY j, cid) u
  ON c0.j = u.j AND c0.cid = u.cid
)"""
        )
    parts.append(
        f"""av AS (
  SELECT e.vec_id, r.j, list_slice(e.v, r.j * d.dsub + 1, (r.j + 1) * d.dsub) AS s
  FROM ev e, range(0, {m}) r(j), dims d
)"""
    )
    parts.append(
        f"""enc AS (
  SELECT a.vec_id, a.j, c.cid, {sd.format(s='a.s', c='c.c')} AS dist
  FROM av a JOIN pc{iters} c ON a.j = c.j
  QUALIFY row_number() OVER (PARTITION BY a.vec_id, a.j ORDER BY dist, c.cid) = 1
)"""
    )
    parts.append("q AS (SELECT v AS qv FROM ev WHERE vec_id = 0)")
    parts.append(
        f"""qs AS (
  SELECT r.j, list_slice(q.qv, r.j * d.dsub + 1, (r.j + 1) * d.dsub) AS s
  FROM q, range(0, {m}) r(j), dims d
)"""
    )
    parts.append(
        f"""tab AS (
  SELECT c.j, c.cid, {sd.format(s='qs.s', c='c.c')} AS d2
  FROM pc{iters} c JOIN qs ON c.j = qs.j
)"""
    )
    parts.append(
        """adc AS (
  SELECT e.vec_id AS id, round(list_sum(list(t.d2 ORDER BY t.j)), 6) AS adc_dist
  FROM enc e JOIN tab t ON e.j = t.j AND e.cid = t.cid
  GROUP BY e.vec_id
)"""
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT id, adc_dist FROM adc ORDER BY adc_dist, id LIMIT {k}"
    )


# --- frame-kernel oracles --------------------------------------------------
# queries._doc_frames tiles each document's utf-8 bytes into a 16x16x3 pixel
# grid and PNG round-trips pixel-exact, so decoded frame pixels ARE the tiled
# text bytes: p[i] = byte(text)[(i mod len)] for i in 0..767.  Testdata text
# is ASCII by construction (verified at all SFs), so ascii(substr(...)) is
# the byte value.  Every kernel below stays on exact dyadic rationals before
# its floor(+0.5) requantize, so the twins are exact integer arithmetic.

_FRAME_H, _FRAME_W, _FRAME_C = 16, 16, 3
_FRAME_N = _FRAME_H * _FRAME_W * _FRAME_C  # 768


def _doc_pixels_sql() -> str:
    """CTEs d (asset_id, tiled-source text) and pix (asset_id, p = the 768
    tiled pixel bytes as a list) — the shared front of every frame-kernel
    oracle."""
    return f"""d AS (
  SELECT doc_id AS asset_id, coalesce(nullif(text, ''), ' ') AS t FROM documents
),
pix AS (
  SELECT asset_id,
         list_transform(range(0, {_FRAME_N}),
           i -> ascii(substr(t, CAST((i % length(t)) + 1 AS INTEGER), 1))) AS p
  FROM d
)"""


def _wsum_sql(lst: str, n: int) -> str:
    """Position-weighted byte sum sum((j+1) * lst[j]) as BIGINT."""
    return (
        f"CAST(list_sum(list_transform(range(0, {n}), "
        f"j -> (j + 1) * {lst}[j + 1])) AS BIGINT)"
    )


def _blur_sql() -> str:
    """3x3 [1,2,1]⊗[1,2,1]/16 Gaussian with BORDER_REFLECT_101 over the
    tiled 16x16x3 grid; every output byte is (S+8)//16 exactly (the
    separable float passes stay on exact sixteenths)."""
    y, x, c = "(j // 48)", "((j // 3) % 16)", "(j % 3)"

    def refl(e: str) -> str:  # reflect-101: -1 -> 1, 16 -> 14
        return f"(CASE WHEN {e} < 0 THEN -({e}) WHEN {e} > 15 THEN 30 - ({e}) ELSE {e} END)"

    terms = []
    for dy, wy in ((-1, 1), (0, 2), (1, 1)):
        for dx, wx in ((-1, 1), (0, 2), (1, 1)):
            ry = refl(f"{y} + {dy}") if dy else y
            rx = refl(f"{x} + {dx}") if dx else x
            terms.append(f"{wy * wx} * p[({ry} * 16 + {rx}) * 3 + {c} + 1]")
    s = " + ".join(terms)
    return f"""WITH {_doc_pixels_sql()},
bl AS (
  SELECT asset_id,
         list_transform(range(0, {_FRAME_N}), j -> ({s} + 8) // 16) AS b
  FROM pix
)
SELECT asset_id, {_FRAME_H} AS height, {_FRAME_W} AS width,
       CAST(list_sum(b) AS BIGINT) AS pix_sum,
       {_wsum_sql('b', _FRAME_N)} AS pix_wsum
FROM bl
"""


def _resize_sql() -> str:
    """16x16 -> 8x4 bilinear with cv2 half-pixel centers: at these scale
    factors both axis fracs are exactly 0.5, so each output byte is the
    floor(+0.5) of a 4-neighbor average — (S+2)//4 in integers.  Source
    rows are 2*dy, 2*dy+1; source cols are 4*dx+1, 4*dx+2."""
    nh, nw = 8, 4
    n = nh * nw * 3  # 96 output bytes; row stride nw*3 = 12
    def src(yoff: int, xoff: int) -> str:
        return (
            f"p[(((j // 12) * 2 + {yoff}) * 16 + ((j // 3) % 4) * 4 + {xoff}) * 3"
            f" + (j % 3) + 1]"
        )
    s = " + ".join(src(dy, dx) for dy in (0, 1) for dx in (1, 2))
    return f"""WITH {_doc_pixels_sql()},
rs AS (
  SELECT asset_id,
         list_transform(range(0, {n}), j -> ({s} + 2) // 4) AS rp
  FROM pix
)
SELECT asset_id, {nh} AS height, {nw} AS width, {n} AS nbytes,
       CAST(list_sum(rp) AS BIGINT) AS pix_sum,
       {_wsum_sql('rp', n)} AS pix_wsum
FROM rs
"""


def _histogram_sql() -> str:
    """Per-channel 16-bin histogram of the tiled bytes: channel = i mod 3,
    bin = byte // 16; a (channel, bin) grid left-join keeps the zero bins
    the Spark side emits."""
    return f"""WITH {_doc_pixels_sql()},
hx AS (
  SELECT asset_id, CAST(i % 3 AS INTEGER) AS channel,
         CAST(p[CAST(i AS INTEGER) + 1] // 16 AS INTEGER) AS bin
  FROM pix, range(0, {_FRAME_N}) r(i)
),
cnt AS (SELECT asset_id, channel, bin, COUNT(*) AS n FROM hx GROUP BY 1, 2, 3),
grid AS (
  SELECT asset_id, CAST(cc.c AS INTEGER) AS channel, CAST(bb.b AS INTEGER) AS bin
  FROM d, range(0, 3) cc(c), range(0, 16) bb(b)
)
SELECT g.asset_id, g.channel, g.bin, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
FROM grid g LEFT JOIN cnt
  ON g.asset_id = cnt.asset_id AND g.channel = cnt.channel AND g.bin = cnt.bin
"""


def _multimodal_decode_sql() -> str:
    """Twin for the six-format media pipeline: payload pixels are tiled
    text bytes (32x32x3 RGB for PNG/WebP/TIFF, 32x32 grey replicated for
    GIF), the 32->16 half-pixel resize is a 4-neighbor (S+2)//4, and the
    lossy JPEG rows (doc_id % 6 in (1, 5): baseline and progressive)
    carry NULL checksums in both engines."""

    def byte(i: str) -> str:  # tiled text byte at 0-based index expr i
        return f"ascii(substr(t, CAST((({i}) % length(t)) + 1 AS INTEGER), 1))"

    # RGB source pixel at 32-grid (y, x, c) -> tiled index (y*32+x)*3+c
    def rgb(yoff: int, xoff: int) -> str:
        return byte(
            f"(((j // 48) * 2 + {yoff}) * 32 + ((j // 3) % 16) * 2 + {xoff}) * 3"
            f" + (j % 3)"
        )

    # grey source pixel at 32-grid (y, x) -> tiled index y*32+x
    def grey(yoff: int, xoff: int) -> str:
        return byte(
            f"((j // 48) * 2 + {yoff}) * 32 + ((j // 3) % 16) * 2 + {xoff}"
        )

    rgb4 = " + ".join(rgb(dy, dx) for dy in (0, 1) for dx in (0, 1))
    grey4 = " + ".join(grey(dy, dx) for dy in (0, 1) for dx in (0, 1))
    return f"""WITH d AS (
  SELECT doc_id AS asset_id, doc_id % 6 AS md6,
         coalesce(nullif(text, ''), ' ') AS t
  FROM documents
),
res AS (
  SELECT asset_id, md6,
    CASE WHEN md6 IN (1, 5) THEN NULL ELSE
      list_transform(range(0, 768), j ->
        CASE WHEN md6 = 2 THEN ({grey4} + 2) // 4
             ELSE ({rgb4} + 2) // 4 END)
    END AS rp
  FROM d
)
SELECT asset_id, 16 AS height, 16 AS width, 3 AS channels,
       CAST(list_sum(rp) AS BIGINT) AS pix_sum,
       {_wsum_sql('rp', 768)} AS pix_wsum
FROM res
"""


def _video_decode_sql() -> str:
    """Twin for the GOP-pruned video decode: the SVF / raw-mp4 frames are
    pixel-exact synthetic_frame grids — value (7s + 13f + 3x + 5y + 11c)
    mod 256 (scanner_spark.frames.synthetic_frame / FIXTURES.md) — so
    their checksums come from pure VALUES + range SQL; the lossy avc1
    rows carry NULL checksums in both engines."""
    rows = []
    for video, s, frames, h, w, lossless in (
        ("vid0.svf", 0, [0, 13, 14, 39], 12, 16, True),
        ("vid1.svf", 1, [25], 12, 16, True),
        ("vid2.mp4", 2, [7, 31], 12, 16, True),
        ("vid3.mp4", 3, [1, 6], 16, 16, False),
        # multi-slice avc1 (2 slices/picture, I/P/B GOP): lossy -> NULL
        ("vid4.mp4", 4, [2, 5], 16, 16, False),
        # CABAC-entropy avc1 (I/P/B GOP, arithmetic coding): lossy -> NULL
        ("vid5.mp4", 5, [1, 6], 16, 16, False),
        # hierarchical-B avc1 (b-pyramid: referenced B + ref-list
        # modification, 4-deep DPB walk): lossy -> NULL
        ("vid6.mp4", 6, [5, 10], 16, 16, False),
        # mixed slice-kind avc1 (intra-refresh: I + P slices in one
        # picture): lossy -> NULL
        ("vid7.mp4", 7, [3, 6], 32, 32, False),
        # deblocked avc1 (in-loop §8.7 filter active, qp=30): lossy -> NULL
        ("vid8.mp4", 8, [1, 6], 32, 32, False),
        # multi-reference avc1 (2-deep RefPicList0, te(v) ref_idx,
        # deblocked): lossy -> NULL
        ("vid9.mp4", 9, [2, 6], 32, 32, False),
        # implicit weighted-bipred avc1 (POC-distance weights): lossy -> NULL
        ("vid10.mp4", 10, [1, 5], 32, 32, False),
        # adaptive ref-pic marking avc1 (MMCO 4+6 long-term anchor,
        # idc-2 list modification): lossy -> NULL
        ("vid11.mp4", 11, [3, 7], 32, 32, False),
        # multi-reference B avc1 (2-deep list 0, te(v) ref_idx): lossy -> NULL
        ("vid12.mp4", 12, [3, 8], 32, 32, False),
        # scaling-matrix avc1 (High-profile coded 4x4 lists, §8.5.12.2
        # weighted dequant): lossy -> NULL
        ("vid13.mp4", 13, [2, 5], 32, 32, False),
        # CABAC multi-reference B avc1 (unary ref_idx, neighbour-inc
        # contexts, 2-deep list 0): lossy -> NULL
        ("vid14.mp4", 14, [3, 8], 32, 32, False),
        # spatial B_Direct avc1 (§8.4.1.2.2 derivation, no motion
        # syntax in direct MBs): lossy -> NULL
        ("vid15.mp4", 15, [1, 6], 32, 32, False),
        # transform_size_8x8 avc1 (High profile: Intra_8x8, CABAC 8x8
        # residual blocks, coded 8x8 scaling lists): lossy -> NULL
        ("vid16.mp4", 16, [1, 6], 32, 32, False),
        # temporal direct avc1 (§8.4.1.2.3 POC-scaled co-located
        # motion, walk-supplied POC tags): lossy -> NULL
        ("vid17.mp4", 17, [1, 6], 32, 32, False),
        # MMCO 5 avc1 (§8.2.5.4.5 DPB flush + frame_num/POC rebase,
        # rebased-PicNum list naming): lossy -> NULL
        ("vid18.mp4", 18, [2, 6], 32, 32, False),
        # sub-macroblock partition avc1, CABAC (P_8x8 + B_8x8 with
        # Direct/L0/L1/Bi quadrants, Table 9-38 sub_mb_type): lossy -> NULL
        ("vid19.mp4", 19, [1, 6], 32, 32, False),
        # 16x8 two-partition avc1, CAVLC (P_L0_L0_16x8 + Table 7-14 B
        # combinations, directional MV predictors): lossy -> NULL
        ("vid20.mp4", 20, [1, 6], 32, 32, False),
    ):
        for f in frames:
            rows.append(
                f"('{video}', {s}, {f}, {h}, {w}, {'TRUE' if lossless else 'FALSE'})"
            )
    vals = ",\n  ".join(rows)
    pixel = (
        "(s * 7 + frame_no * 13 + ((i // 3) % w) * 3 + (i // (w * 3)) * 5"
        " + (i % 3) * 11) % 256"
    )
    return f"""WITH wanted(video, s, frame_no, h, w, lossless) AS (VALUES
  {vals}
),
px AS (
  SELECT video, CAST(frame_no AS BIGINT) AS frame_no, h, w,
    CASE WHEN lossless THEN
      list_transform(range(0, h * w * 3), i -> {pixel})
    ELSE NULL END AS p
  FROM wanted
)
SELECT video, frame_no,
       CAST(list_sum(p) AS BIGINT) AS pix_sum,
       CAST(list_sum(list_transform(range(0, h * w * 3),
            j -> (j + 1) * p[j + 1])) AS BIGINT) AS pix_wsum
FROM px
"""


def _encode_png_sql() -> str:
    """Round-trip twin: the Spark side re-decodes its own PNG and emits
    checksums of the decoded pixels, which must equal the tiled bytes."""
    return f"""WITH {_doc_pixels_sql()}
SELECT asset_id, TRUE AS roundtrip_ok,
       CAST(list_sum(p) AS BIGINT) AS pix_sum,
       {_wsum_sql('p', _FRAME_N)} AS pix_wsum
FROM pix
"""


# money aggregation mirrors queries._dec: DECIMAL(12,2) facts, DECIMAL(4,2)
# rate factors, exact decimal sums cast to DOUBLE at the end
_DP = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))"
)


def _minhash_sql(k: int = 16, bands: int = 4) -> str:
    coeffs = minhash_coeffs(k)
    r = k // bands
    mins = ",\n         ".join(
        f"MIN(({a} * hm + {b}) % {MINHASH_P}) AS m{i}" for i, (a, b) in enumerate(coeffs)
    )
    band_exprs = ",\n         ".join(
        "md5(" + " || ',' || ".join(f"CAST(m{i} AS VARCHAR)" for i in range(b * r, (b + 1) * r)) + f") AS band{b}"
        for b in range(bands)
    )
    cand_union = "\n    UNION ALL\n    ".join(
        f"SELECT x.doc AS doc_a, y.doc AS doc_b FROM banded x JOIN banded y "
        f"ON x.band{b} = y.band{b} AND x.doc < y.doc"
        for b in range(bands)
    )
    matches = " + ".join(f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(k))
    return f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest({_TOKS}) AS tok,
         generate_subscripts({_TOKS}, 1) AS ord
  FROM documents
),
sh0 AS (
  SELECT doc, tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
  FROM toks WINDOW w AS (PARTITION BY doc ORDER BY ord)
),
sh AS (SELECT DISTINCT doc, shingle FROM sh0 WHERE shingle IS NOT NULL),
hashed AS (SELECT doc, {h60_sql('shingle')} % {MINHASH_P} AS hm FROM sh),
sig AS (SELECT doc, {mins} FROM hashed GROUP BY doc),
banded AS (SELECT doc, {band_exprs} FROM sig),
cand AS (SELECT DISTINCT doc_a, doc_b FROM ({cand_union})),
est AS (
  SELECT c.doc_a, c.doc_b, round(({matches}) / {k}.0, 6) AS est_jaccard
  FROM cand c JOIN sig a ON a.doc = c.doc_a JOIN sig b ON b.doc = c.doc_b
)
SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= {Q.MINHASH_THRESHOLD}
"""


def _text_analyze_sql() -> str:
    def sw_count(words: list[str]) -> str:
        lst = ", ".join(f"'{w}'" for w in words)
        return f"len(list_filter(toks, t -> list_contains([{lst}], t)))"

    s_en = sw_count(LANG_STOPWORDS["en"])
    s_de = sw_count(LANG_STOPWORDS["de"])
    s_fr = sw_count(LANG_STOPWORDS["fr"])
    s_es = sw_count(LANG_STOPWORDS["es"])
    return f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
    CAST(length(toks) AS BIGINT) AS n_tokens,
    CAST(ceil(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) / 4) +
         length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS BIGINT) AS n_tokens_bpe,
    round(coalesce({s_en} / nullif(length(toks), 0), 0.0), 6) AS stopword_ratio,
    round(coalesce(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) /
                   nullif(length(text), 0), 0.0), 6) AS punct_ratio,
    {s_en} AS c_en, {s_de} AS c_de, {s_fr} AS c_fr, {s_es} AS c_es,
    md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint
  FROM t
)
SELECT doc_id, n_tokens, n_tokens_bpe, stopword_ratio, punct_ratio,
  CASE
    WHEN c_en = greatest(c_en, c_de, c_fr, c_es) AND greatest(c_en, c_de, c_fr, c_es) > 0 THEN 'en'
    WHEN c_de = greatest(c_en, c_de, c_fr, c_es) AND greatest(c_en, c_de, c_fr, c_es) > 0 THEN 'de'
    WHEN c_fr = greatest(c_en, c_de, c_fr, c_es) AND greatest(c_en, c_de, c_fr, c_es) > 0 THEN 'fr'
    WHEN c_es = greatest(c_en, c_de, c_fr, c_es) AND greatest(c_en, c_de, c_fr, c_es) > 0 THEN 'es'
    ELSE 'und'
  END AS lang_pred,
  fingerprint
FROM m
"""


def _doc_quality_sql() -> str:
    lst = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    sw = f"len(list_filter(toks, t -> list_contains([{lst}], t)))"
    return f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id,
    least(CAST(length(toks) AS DOUBLE) / 50.0, 1.0) AS len_score,
    least(coalesce({sw} / nullif(length(toks), 0), 0.0) * 4.0, 1.0) AS sw_score,
    coalesce(list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE)))
             / nullif(length(toks), 0), 0.0) AS wl,
    coalesce(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
             / nullif(length(text), 0), 0.0) AS pr
  FROM t
),
s AS (
  SELECT doc_id,
    round((0.4 * len_score + 0.3 * sw_score +
           0.3 * (CASE WHEN wl >= 3.0 AND wl <= 10.0 THEN 1.0 ELSE 0.5 END)) *
          (CASE WHEN pr > 0.1 THEN 0.5 ELSE 1.0 END), 6) AS quality
  FROM m
)
SELECT doc_id, quality, CAST(quality >= 0.5 AS INTEGER) AS kept FROM s
"""


def _bucket_sql(vec: str, dim: int, bits: int) -> str:
    """DuckDB twin of functions/simsearch.lsh_bucket over the same
    deterministic hyperplanes (sequential list_dot_product — bit-identical
    to the Spark UDF's per-dim accumulation)."""
    from scanner_spark.functions.simsearch import hyperplanes

    terms = []
    for j, p in enumerate(hyperplanes(dim, bits)):
        lit = "[" + ", ".join(repr(x) for x in p) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec}, {lit}) > 0 THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


def _knn_lsh_sql(dim: int = Q.EMB_DIM, bits: int = 6, k: int = 5) -> str:
    def bucket_expr(vec: str) -> str:
        return _bucket_sql(vec, dim, bits)

    return f"""
WITH e AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE id = 0),
b AS (SELECT id, v, {bucket_expr('v')} AS bucket FROM e),
qb AS (SELECT {bucket_expr('qv')} AS qbucket FROM q)
SELECT b.id,
       round(list_dot_product(b.v, q.qv) /
             (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
FROM b, q, qb
WHERE bit_count(xor(CAST(b.bucket AS BIGINT), CAST(qb.qbucket AS BIGINT))) <= 1
ORDER BY score DESC, id LIMIT {k}
"""


def _pipeline_sql() -> str:
    def sw_count(words: list[str]) -> str:
        lst = ", ".join(f"'{w}'" for w in words)
        return f"len(list_filter(toks, t -> list_contains([{lst}], t)))"

    sw = sw_count(LANG_STOPWORDS["en"])
    s_en, s_de, s_fr, s_es = (sw_count(LANG_STOPWORDS[x]) for x in ("en", "de", "fr", "es"))
    return f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
m AS (
  SELECT doc_id, text, toks,
    least(CAST(length(toks) AS DOUBLE) / 50.0, 1.0) AS len_score,
    least(coalesce({sw} / nullif(length(toks), 0), 0.0) * 4.0, 1.0) AS sw_score,
    coalesce(list_sum(list_transform(toks, t -> CAST(length(t) AS DOUBLE)))
             / nullif(length(toks), 0), 0.0) AS wl,
    coalesce(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
             / nullif(length(text), 0), 0.0) AS pr
  FROM t
),
scored AS (
  SELECT doc_id, text, toks,
    round((0.4 * len_score + 0.3 * sw_score +
           0.3 * (CASE WHEN wl >= 3.0 AND wl <= 10.0 THEN 1.0 ELSE 0.5 END)) *
          (CASE WHEN pr > 0.1 THEN 0.5 ELSE 1.0 END), 6) AS quality
  FROM m
),
kept AS (
  SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
  FROM scored WHERE quality >= 0.5
),
surv AS (SELECT doc_id, toks, quality FROM kept WHERE doc_id = keep_id)
SELECT doc_id, quality, CAST(length(toks) AS BIGINT) AS n_tokens,
  CASE
    WHEN {s_en} = greatest({s_en}, {s_de}, {s_fr}, {s_es}) AND greatest({s_en}, {s_de}, {s_fr}, {s_es}) > 0 THEN 'en'
    WHEN {s_de} = greatest({s_en}, {s_de}, {s_fr}, {s_es}) AND greatest({s_en}, {s_de}, {s_fr}, {s_es}) > 0 THEN 'de'
    WHEN {s_fr} = greatest({s_en}, {s_de}, {s_fr}, {s_es}) AND greatest({s_en}, {s_de}, {s_fr}, {s_es}) > 0 THEN 'fr'
    WHEN {s_es} = greatest({s_en}, {s_de}, {s_fr}, {s_es}) AND greatest({s_en}, {s_de}, {s_fr}, {s_es}) > 0 THEN 'es'
    ELSE 'und'
  END AS lang_pred
FROM surv
"""


def oracle_sql() -> dict[str, str]:
    g = ",".join(f"({i},{r})" for i, r in enumerate(Q.GATHER_ROWS))
    w = ",".join(f"({i},{r})" for i, r in enumerate(Q.WARMUP_ROWS))
    cos = (
        "round(list_dot_product(a.v, b.v) / "
        "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)"
    )
    return {
        # --- Scanner index-domain operators ---------------------------------
        "scanner_stride": f"WITH {_ST} "
        "SELECT stream_id, idx // 8 AS idx, event_id, value FROM st WHERE idx % 8 = 0",
        "scanner_range": f"WITH {_ST} "
        "SELECT stream_id, idx - 100 AS idx, event_id, value FROM st "
        "WHERE idx >= 100 AND idx < 200",
        "scanner_strided_ranges": f"WITH {_ST} "
        "SELECT stream_id, idx // 4 AS idx, event_id, value FROM st "
        "WHERE idx >= 0 AND idx < 40 AND idx % 4 = 0 "
        "UNION ALL "
        "SELECT stream_id, 10 + (idx - 100) // 4 AS idx, event_id, value FROM st "
        "WHERE idx >= 100 AND idx < 140 AND (idx - 100) % 4 = 0",
        "scanner_gather": f"WITH {_ST}, wanted(pos, want) AS (SELECT * FROM (VALUES {g}) t(pos, want)) "
        "SELECT st.stream_id, CAST(w.pos AS BIGINT) AS idx, st.event_id, st.value "
        "FROM st JOIN wanted w ON st.idx = w.want",
        "scanner_repeat": f"WITH {_ST} "
        "SELECT stream_id, CAST(idx * 3 + o AS BIGINT) AS idx, event_id, value "
        "FROM st CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS o) WHERE idx < 50",
        "scanner_repeat_null": f"WITH {_ST} "
        "SELECT stream_id, CAST(idx * 3 + o AS BIGINT) AS idx, "
        "CASE WHEN o = 0 THEN event_id END AS event_id, "
        "CASE WHEN o = 0 THEN value END AS value "
        "FROM st CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS o) WHERE idx < 50",
        "scanner_slice_state_unslice": f"WITH {_ST} "
        "SELECT stream_id, idx, event_id, "
        "CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER "
        f"(PARTITION BY stream_id, idx // {Q.SLICE_GROUP} ORDER BY idx "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents FROM st",
        "scanner_stencil_smooth": f"WITH {_ST}, r AS (SELECT * FROM st WHERE idx < 200) "
        "SELECT stream_id, idx, event_id, "
        "(coalesce(lag(value) OVER w, value) + value + coalesce(lead(value) OVER w, value)) / 3.0 AS smoothed "
        "FROM r WINDOW w AS (PARTITION BY stream_id ORDER BY idx)",
        "scanner_ranges": f"WITH {_ST} "
        "SELECT stream_id, idx, event_id, value FROM st WHERE idx >= 0 AND idx < 30 "
        "UNION ALL "
        "SELECT stream_id, 30 + (idx - 20) AS idx, event_id, value FROM st "
        "WHERE idx >= 20 AND idx < 50",
        # slices (0,15),(5,25),(15,35) sampled per-slice with (0,10),(5,15),(5,15)
        "scanner_overlap_slices": f"WITH {_ST} "
        "SELECT stream_id, CAST(0 AS BIGINT) AS slice_id, idx, event_id, value "
        "FROM st WHERE idx >= 0 AND idx < 10 "
        "UNION ALL "
        "SELECT stream_id, CAST(1 AS BIGINT) AS slice_id, idx - 10 AS idx, event_id, value "
        "FROM st WHERE idx >= 10 AND idx < 20 "
        "UNION ALL "
        "SELECT stream_id, CAST(2 AS BIGINT) AS slice_id, idx - 20 AS idx, event_id, value "
        "FROM st WHERE idx >= 20 AND idx < 30",
        "scanner_variadic": f"WITH {_ST} "
        "SELECT stream_id, idx, event_id, value * 2.0 + idx AS mixed FROM st "
        "WHERE idx < 500",
        "scanner_stream_args": f"WITH {_ST} "
        "SELECT stream_id, idx, event_id, value * CASE stream_id "
        + " ".join(
            f"WHEN '{k}' THEN {v}" for k, v in Q.STREAM_FACTORS.items()
        )
        + " END AS scaled FROM st",
        "scanner_all": f"WITH {_ST} SELECT stream_id, idx, event_id, value FROM st",
        "scanner_all_distributed": f"WITH {_ST} SELECT stream_id, idx, event_id, value FROM st",
        "scanner_stencil_null": f"WITH {_ST}, r AS (SELECT * FROM st WHERE idx < 100) "
        "SELECT stream_id, idx, event_id, "
        "coalesce(lag(value) OVER w, 0) + value + coalesce(lead(value) OVER w, 0) AS esum "
        "FROM r WINDOW w AS (PARTITION BY stream_id ORDER BY idx)",
        "scanner_null_passthrough": f"WITH {_ST} "
        "SELECT stream_id, CAST(idx * 3 + o AS BIGINT) AS idx, "
        "CASE WHEN o = 0 THEN event_id END AS event_id, "
        "CASE WHEN o = 0 THEN value * 2.0 END AS doubled "
        "FROM st CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS o) WHERE idx < 50",
        "scanner_warmup_gather": f"""
WITH wanted(pos, want) AS (SELECT * FROM (VALUES {w}) t(pos, want)),
brk AS (SELECT pos, want,
        CASE WHEN want - lag(want) OVER (ORDER BY pos) <= {Q.WARMUP + 1} THEN 0 ELSE 1 END AS b
        FROM wanted),
isl AS (SELECT pos, want, SUM(b) OVER (ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp FROM brk),
runs AS (SELECT grp, GREATEST(MIN(want) - {Q.WARMUP}, 0) AS lo FROM isl GROUP BY grp),
ctrs AS (SELECT i.pos, i.want - r.lo AS ctr FROM isl i JOIN runs r USING (grp)),
streams AS (SELECT DISTINCT event_type AS stream_id FROM events)
SELECT s.stream_id, CAST(c.pos AS BIGINT) AS idx, CAST(c.ctr AS BIGINT) AS ctr
FROM streams s CROSS JOIN ctrs c
""",
        # --- relational -------------------------------------------------------
        "tpch_q1": f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM({_DP}) AS DOUBLE) AS sum_disc_price,
  CAST(SUM({_DP} * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "tpch_q3": f"""
SELECT l_orderkey, CAST(SUM({_DP}) AS DOUBLE) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-06-30'
  AND l_shipdate > TIMESTAMP '1996-06-30'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
        "tpch_q5": f"""
SELECT n_name, CAST(SUM({_DP}) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
        "tpch_q6": """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
""",
        "tpch_q4_priority": """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
        "tpch_q10": f"""
SELECT c_custkey, c_name, n_name, CAST(SUM({_DP}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
        "tpch_q14": f"""
WITH j AS (
  SELECT CASE WHEN p_type = 'PROMO' THEN {_DP} ELSE CAST(0 AS DECIMAL(12,2)) END AS pr,
         {_DP} AS r
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-07-01'
),
a AS (SELECT CAST(SUM(pr) AS DOUBLE) AS promo_rev, CAST(SUM(r) AS DOUBLE) AS total_rev FROM j)
SELECT round(100.0 * promo_rev / total_rev, 6) AS promo_pct, promo_rev, total_rev FROM a
""",
        "tpch_q18": """
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 250
)
SELECT c_custkey, c_name, o_orderkey,
       CAST(epoch(o_orderdate) AS BIGINT) AS orderdate_epoch,
       o_totalprice, sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
        "top_customers_per_nation": """
WITH spent AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY o_custkey
)
SELECT n_name, c_custkey, revenue, rnk FROM (
  SELECT n_name, c_custkey, revenue,
         rank() OVER (PARTITION BY n_name ORDER BY revenue DESC, c_custkey) AS rnk
  FROM customer JOIN spent ON c_custkey = o_custkey
  JOIN nation ON c_nationkey = n_nationkey
) WHERE rnk <= 3
""",
        "events_sessionize": """
WITH g AS (
  SELECT user_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, COUNT(*) AS n_events, CAST(SUM(new_sess) + 1 AS BIGINT) AS n_sessions
FROM g GROUP BY user_id
""",
        "events_hourly": """
SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       COUNT(*) AS n,
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY 1, 2
""",
        # streaming twin: identical semantics, identical oracle
        "stream_events_hourly": """
SELECT event_type, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
       COUNT(*) AS n,
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY 1, 2
""",
        "part_brand_stats": """
SELECT p_brand, COUNT(*) AS n_parts, MIN(p_retailprice) AS min_price,
       MAX(p_retailprice) AS max_price,
       CAST(SUM(p_size) AS DOUBLE) / COUNT(*) AS avg_size
FROM part GROUP BY p_brand
""",
        "segment_intersect": """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 400000
""",
        "events_user_counts": """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
        "events_asof_signup": """
WITH m AS (
  SELECT event_id, user_id, event_type,
         last_value(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS UNBOUNDED PRECEDING) AS last_signup_us
  FROM events
)
SELECT event_id, user_id, last_signup_us FROM m WHERE event_type = 'purchase'
""",
        "orders_percentiles": """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
       COUNT(*) AS n
FROM orders GROUP BY o_orderstatus
""",
        "orders_rollup": """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
        "orders_cube": """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total,
       GROUPING(o_orderstatus, o_orderpriority) AS gid
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
        "events_retention": """
WITH base AS (
  SELECT user_id, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk FROM events
),
first AS (SELECT user_id, MIN(wk) AS cohort_wk FROM base GROUP BY user_id),
j AS (
  SELECT DISTINCT b.user_id, f.cohort_wk, b.wk - f.cohort_wk AS weeks_since
  FROM base b JOIN first f USING (user_id)
)
SELECT cohort_wk, weeks_since, COUNT(*) AS n_users
FROM j GROUP BY cohort_wk, weeks_since
""",
        "customers_without_orders": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
""",
        "events_sliding_daily": """
WITH daily AS (
  SELECT event_type, CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_epoch,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day_epoch, n,
       CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day_epoch
                         RANGE BETWEEN 172800 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_3d
FROM daily
""",
        "events_pivot": """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS click,
       COUNT(*) FILTER (event_type = 'error') AS error,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'signup') AS signup,
       COUNT(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_id
""",
        # --- LLM pipeline ------------------------------------------------------
        "text_analyze": _text_analyze_sql(),
        "dedup_exact_groups": """
SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1
""",
        "dedup_materialize": """
WITH k AS (
  SELECT doc_id, md5(text) AS content_hash,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
  FROM documents
)
SELECT doc_id, content_hash FROM k WHERE doc_id = keep_id
""",
        "dedup_jaccard_pairs": f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest({_TOKS}) AS tok,
         generate_subscripts({_TOKS}, 1) AS ord
  FROM documents
),
sh0 AS (
  SELECT doc, tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
  FROM toks WINDOW w AS (PARTITION BY doc ORDER BY ord)
),
shs AS (SELECT DISTINCT doc, shingle FROM sh0 WHERE shingle IS NOT NULL),
shu AS (SELECT doc, {h60_sql('shingle')} AS shingle FROM shs),
-- skew cap in lockstep with dedup.ngram_jaccard_pairs(max_shingle_df):
-- shingles shared by more than {Q.JACCARD_MAX_SHINGLE_DF} docs generate no candidates
-- and don't count toward set sizes
good AS (SELECT shingle FROM shu GROUP BY shingle HAVING COUNT(*) <= {Q.JACCARD_MAX_SHINGLE_DF}),
sh AS (SELECT shu.doc, shu.shingle FROM shu JOIN good USING (shingle)),
sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
common AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS cmn
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(cmn / (sa.sz + sb.sz - cmn), 6) AS jaccard
FROM common JOIN sizes sa ON sa.doc = doc_a JOIN sizes sb ON sb.doc = doc_b
WHERE round(cmn / (sa.sz + sb.sz - cmn), 6) >= {Q.JACCARD_THRESHOLD}
""",
        "dedup_minhash_lsh": _minhash_sql(),
        # streaming twin: the DISTINCT emitted pair set on a bounded replay
        # equals the batch LSH pair set exactly (same sketches, same oracle)
        "stream_dedup_minhash_lsh": _minhash_sql(),
        "dedup_minhash_clusters": f"""
WITH RECURSIVE pairs AS ({_minhash_sql()}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
lab AS (
  SELECT u AS doc, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
)
SELECT component, COUNT(*) AS n_members, MIN(doc) AS keep_id
FROM lab GROUP BY component
""",
        "dedup_simhash_sigs": f"""
WITH toks AS (SELECT DISTINCT doc_id AS doc, unnest({_TOKS}) AS tok FROM documents),
h AS (SELECT doc, {h60_sql('tok')} AS h FROM toks),
bits AS (SELECT unnest(generate_series(0, 47)) AS j),
bitsum AS (
  SELECT doc, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS wsum
  FROM h CROSS JOIN bits GROUP BY doc, j
)
SELECT doc, CAST(SUM(CASE WHEN wsum > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
FROM bitsum GROUP BY doc
""",
        "dedup_simhash_pairs": f"""
WITH toks AS (SELECT DISTINCT doc_id AS doc, unnest({_TOKS}) AS tok FROM documents),
h AS (SELECT doc, {h60_sql('tok')} AS h FROM toks),
bits AS (SELECT unnest(generate_series(0, 47)) AS j),
bitsum AS (
  SELECT doc, j, SUM(CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END) AS wsum
  FROM h CROSS JOIN bits GROUP BY doc, j
),
sig AS (
  SELECT doc, CAST(SUM(CASE WHEN wsum > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
  FROM bitsum GROUP BY doc
)
-- brute-force all-pairs: the Spark side's block-rotation scheme claims
-- FULL recall at the radius, so the oracle is the plain definition
SELECT a.doc AS doc_a, b.doc AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sig a JOIN sig b ON a.doc < b.doc
WHERE bit_count(xor(a.simhash, b.simhash)) <= {Q.SIMHASH_MAX_HAMMING}
""",
        "vocab_topk": f"""
WITH tok AS (SELECT DISTINCT doc_id, unnest({_TOKS}) AS tok FROM documents)
SELECT tok, COUNT(*) AS df_count FROM tok GROUP BY tok
ORDER BY df_count DESC, tok LIMIT {Q.VOCAB_TOPK}
""",
        "emb_label_centroids": f"""
WITH q AS (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {Q.EMB_Q}) AS BIGINT) AS xq
  FROM embeddings
)
SELECT label, dim, COUNT(*) AS n,
       CAST(SUM(xq) AS DOUBLE) / (COUNT(*) * {float(Q.EMB_Q)}) AS centroid
FROM q GROUP BY label, dim
""",
        "doc_quality": _doc_quality_sql(),
        "pipeline_clean_corpus": _pipeline_sql(),
        # --- training-data curation (functions/curation.py) -----------------
        "doc_decontaminate": f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest({_TOKS}) AS tok,
         generate_subscripts({_TOKS}, 1) AS ord
  FROM documents
),
sh0 AS (
  SELECT doc, tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
           || ' ' || lead(tok, 3) OVER w || ' ' || lead(tok, 4) OVER w AS shingle
  FROM toks WINDOW w AS (PARTITION BY doc ORDER BY ord)
),
sh AS (SELECT DISTINCT doc, shingle FROM sh0 WHERE shingle IS NOT NULL),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc % {Q.DECONTAM_EVAL_MOD} = 0),
tr AS (SELECT doc, shingle FROM sh WHERE doc % {Q.DECONTAM_EVAL_MOD} <> 0),
ov AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_overlap
       FROM tr JOIN ev USING (shingle) GROUP BY doc)
SELECT d.doc_id,
       CAST(COALESCE(ov.n_overlap, 0) AS BIGINT) AS n_overlap,
       CASE WHEN COALESCE(ov.n_overlap, 0) > 0 THEN 1 ELSE 0 END AS contaminated
FROM documents d LEFT JOIN ov ON ov.doc = d.doc_id
WHERE d.doc_id % {Q.DECONTAM_EVAL_MOD} <> 0
""",
        "doc_repetition_filter": f"""
WITH toks AS (
  SELECT doc_id AS doc, unnest({_TOKS}) AS tok,
         generate_subscripts({_TOKS}, 1) AS ord
  FROM documents
),
tf AS (SELECT doc, tok, COUNT(*) AS cnt FROM toks GROUP BY doc, tok),
ts AS (SELECT doc, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
              CAST(COUNT(*) AS BIGINT) AS n_distinct,
              CAST(MAX(cnt) AS BIGINT) AS top_cnt
       FROM tf GROUP BY doc),
big0 AS (
  SELECT doc, tok || ' ' || lead(tok, 1) OVER (PARTITION BY doc ORDER BY ord) AS big
  FROM toks
),
bs AS (SELECT doc, CAST(COUNT(*) AS BIGINT) AS n_big,
              CAST(COUNT(DISTINCT big) AS BIGINT) AS n_big_distinct
       FROM big0 WHERE big IS NOT NULL GROUP BY doc),
r AS (
  SELECT ts.doc AS doc_id, ts.n_tokens,
         round(1.0 - ts.n_distinct / ts.n_tokens, 6) AS dup_token_ratio,
         round(ts.top_cnt / ts.n_tokens, 6) AS top_token_ratio,
         round(COALESCE(1.0 - bs.n_big_distinct / bs.n_big, 0.0), 6) AS dup_bigram_ratio
  FROM ts LEFT JOIN bs ON bs.doc = ts.doc
)
SELECT doc_id, n_tokens, dup_token_ratio, top_token_ratio, dup_bigram_ratio,
       CASE WHEN dup_token_ratio <= 0.7 AND top_token_ratio <= 0.2
                 AND dup_bigram_ratio <= 0.4 THEN 1 ELSE 0 END AS kept
FROM r
""",
        "events_approx_distinct": f"""
WITH h AS (
  SELECT DISTINCT event_type, {h60_sql("CAST(user_id AS VARCHAR)")} AS hv FROM events
),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
),
k AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_seen, MAX(hv) AS kth
  FROM r WHERE rn <= {Q.KMV_K} GROUP BY event_type
)
SELECT event_type, n_seen,
       CAST(CASE WHEN n_seen < {Q.KMV_K} THEN n_seen
                 ELSE floor({float(Q.KMV_K - 1)} * pow(2.0, 60) / kth)
            END AS BIGINT) AS distinct_est
FROM k
""",
        "events_value_histogram": f"""
WITH b AS (
  SELECT event_type,
         CAST(least(greatest(floor((value - {Q.HIST_LO}) /
                   {(Q.HIST_HI - Q.HIST_LO) / Q.HIST_NBINS}), 0), {Q.HIST_NBINS - 1}) AS INT) AS bin
  FROM events
)
SELECT event_type, bin,
       round({Q.HIST_LO} + bin * {(Q.HIST_HI - Q.HIST_LO) / Q.HIST_NBINS}, 6) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n
FROM b GROUP BY event_type, bin
""",
        "stream_events_dedup": """
SELECT DISTINCT user_id, event_type FROM events
""",
        "stream_events_sessions": """
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
o AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
s AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM o
),
g AS (
  SELECT user_id, sess,
         MIN(us) AS session_start_us,
         MAX(us) + 1800000000 AS session_end_us,
         COUNT(*) AS n
  FROM s GROUP BY user_id, sess
)
SELECT user_id, session_start_us, session_end_us, CAST(n AS BIGINT) AS n
FROM g
""",
        # recomputes the whole audio path from the closed-form sample
        # formula: the Spark side synthesizes s_i = (((i*p)%256)-128)*64,
        # round-trips it through a REAL RIFF/WAVE encode+parse, and
        # extracts integer-exact features — identical values by design
        "multimodal_audio": """
WITH p AS (
  SELECT doc_id, doc_id % 50 + 2 AS per, 1000 + (doc_id % 7) * 100 AS n
  FROM documents
),
s AS (
  SELECT doc_id, n, i, (((i * per) % 256) - 128) * 64 AS v
  FROM p, LATERAL (SELECT unnest(generate_series(0, n - 1)) AS i)
),
x AS (
  SELECT doc_id, n, i, v,
         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
  FROM s
),
f AS (
  SELECT doc_id, n,
         SUM(v * v) AS ss,
         SUM(CASE WHEN pv IS NOT NULL AND
                  (CASE WHEN v >= 0 THEN 1 ELSE -1 END) <>
                  (CASE WHEN pv >= 0 THEN 1 ELSE -1 END)
             THEN 1 ELSE 0 END) AS crossings,
         MAX(ABS(v)) AS peak
  FROM x GROUP BY doc_id, n
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(8000 AS BIGINT) AS sample_rate,
       CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
       round(sqrt(ss / n), 6) AS rms,
       round(crossings / (n - 1), 6) AS zcr,
       CAST(peak AS BIGINT) AS peak
FROM f
""",
        "stream_events_sessions_append": f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
o AS (
  SELECT user_id, us,
         CASE WHEN lag(us) OVER w IS NULL
                OR us - lag(us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS brk
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
),
s AS (
  SELECT user_id, us,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sess
  FROM o
),
g AS (
  SELECT user_id, sess,
         MIN(us) AS session_start_us,
         MAX(us) + 1800000000 AS session_end_us,
         COUNT(*) AS n
  FROM s GROUP BY user_id, sess
),
-- Spark's final watermark: millisecond-truncated max event time minus the
-- delay; a session is FINALIZED (emitted in append mode) iff its end is
-- at or before the watermark (boundary verified empirically: end == wm
-- emits)
wm AS (SELECT (MAX(us) // 1000) * 1000 - {Q.SESSION_APPEND_DELAY_US} AS w FROM e)
SELECT user_id, session_start_us, session_end_us, CAST(n AS BIGINT) AS n
FROM g, wm WHERE session_end_us <= w
""",
        "dedup_keep_best": f"""
WITH RECURSIVE pairs AS (SELECT * FROM ({_minhash_sql()})),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
lab AS (
  SELECT u AS doc, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
),
q AS (SELECT doc_id, quality FROM ({_doc_quality_sql()})),
comp AS (
  SELECT d.doc_id, COALESCE(lab.component, d.doc_id) AS component
  FROM documents d LEFT JOIN lab ON lab.doc = d.doc_id
),
ranked AS (
  SELECT c.doc_id, c.component, q.quality,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY q.quality DESC, c.doc_id ASC) AS rn
  FROM comp c JOIN q ON q.doc_id = c.doc_id
)
SELECT doc_id, component, quality FROM ranked WHERE rn = 1
""",
        "emb_quantize": """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM v
),
q AS (
  SELECT vec_id, scale,
         CASE WHEN scale > 0
              THEN list_transform(v, x -> CAST(floor(x / scale + 0.5) AS INT))
              ELSE list_transform(v, x -> 0) END AS q
  FROM s
)
SELECT vec_id, round(scale, 9) AS scale,
       CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1,
       CAST(list_max(list_transform(q, x -> abs(x))) AS BIGINT) AS q_maxabs
FROM q
""",
        "events_asof_join_op": """
WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup')
SELECT p.event_id, p.user_id, epoch_us(s.ts) AS signup_us
FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
""",
        "docs_pack_sequences": f"""
WITH t AS (
  SELECT doc_id, source, CAST(length({_TOKS}) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS cum
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(floor(cum / {Q.PACK_SEQ_LEN}) AS BIGINT) AS seq_id,
       CAST(cum % {Q.PACK_SEQ_LEN} AS BIGINT) AS seq_offset
FROM c
""",
        "docs_domain_resample": f"""
WITH c AS (SELECT source, COUNT(*) AS n_group FROM documents GROUP BY source)
SELECT d.doc_id, d.source,
       CAST(c.n_group AS BIGINT) AS n_group,
       round(least(1.0, {float(Q.DOMAIN_RESAMPLE_TARGET)} / c.n_group), 6) AS keep_p
FROM documents d JOIN c USING (source)
WHERE {h60_sql("CAST(d.doc_id AS VARCHAR)")} / {float(1 << 60)}
      < least(1.0, {float(Q.DOMAIN_RESAMPLE_TARGET)} / c.n_group)
""",
        "scanner_sparse_load": f"""
SELECT doc_id, source, n_chars FROM documents
WHERE doc_id IN ({", ".join(str(r) for r in Q.SPARSE_LOAD_ROWS)})
   OR (doc_id >= {Q.SPARSE_LOAD_RANGE[0]} AND doc_id < {Q.SPARSE_LOAD_RANGE[1]})
""",
        "docs_stratified_sample": f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {h60_sql("CAST(doc_id AS VARCHAR)")}, doc_id
         ) AS rank
  FROM documents
)
SELECT doc_id, source, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {Q.STRATA_K}
""",
        "doc_chunk_windows": f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, CAST(ceil(len(toks) / {float(Q.CHUNK_SIZE)}) AS INT) - 1)) AS chunk_idx
  FROM t
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(list_slice(toks, chunk_idx * {Q.CHUNK_SIZE} + 1,
                           chunk_idx * {Q.CHUNK_SIZE} + {Q.CHUNK_SIZE})) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(toks, chunk_idx * {Q.CHUNK_SIZE} + 1,
                                  chunk_idx * {Q.CHUNK_SIZE} + {Q.CHUNK_SIZE}), ' ') AS chunk_text
FROM c
""",
        "emb_knn_brute": f"""
WITH e AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE id = 0)
SELECT id, round(list_dot_product(v, qv) /
       (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS score
FROM e, q ORDER BY score DESC, id LIMIT {Q.KNN_K}
""",
        "emb_cosine_pairs": f"""
WITH e0 AS (SELECT vec_id AS id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
e AS (SELECT id, label, v, {_bucket_sql('v', Q.EMB_DIM, Q.EMB_LSH_BITS)} AS bucket FROM e0)
SELECT a.id AS id_a, b.id AS id_b, {cos} AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.bucket = b.bucket AND a.id < b.id
WHERE {cos} >= {Q.COSINE_THRESHOLD}
""",
        "emb_knn_lsh": _knn_lsh_sql(),
        # IVF ANN: the coarse quantizer is the SAME deterministic rounded
        # Lloyd contract as cluster.kmeans (simsearch.ivf_index docstring),
        # so its unroll reuses _kmeans_sql (nlist=8 cells, 2 iterations);
        # probes = the 3 cells nearest the query, candidates brute-scored.
        "emb_knn_ivf": _kmeans_sql(8, Q.EMB_DIM, 2) + f""",
q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
probes AS (
  SELECT c.cid
  FROM cents2 c CROSS JOIN q
  ORDER BY list_sum(list_transform(generate_series(1, len(q.qv)),
           i -> (q.qv[i] - c.c[i]) * (q.qv[i] - c.c[i]))), c.cid
  LIMIT 3
)
SELECT e.vec_id AS id,
       round(list_dot_product(e.v, q.qv) /
             (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
FROM ev e JOIN final f ON e.vec_id = f.vec_id CROSS JOIN q
WHERE f.cid IN (SELECT cid FROM probes)
ORDER BY score DESC, id LIMIT {Q.KNN_K}
""",
        # star-pair graph (pairs_mode='star' in cosine_dup_pairs): exact-dup
        # groups star to their min-id representative; each (label, bucket)
        # emits only (anchor=min rep, member rep) edges that pass the cosine
        # threshold.  Identical edge set to the Spark side by construction.
        "emb_dup_clusters": f"""
WITH RECURSIVE e0 AS (SELECT vec_id AS id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
e AS (SELECT id, label, v, {_bucket_sql('v', Q.EMB_DIM, Q.EMB_LSH_BITS)} AS bucket FROM e0),
g AS (
  SELECT label, bucket, v, MIN(id) AS rid, list(id) AS ids,
         MIN(MIN(id)) OVER (PARTITION BY label, bucket) AS anchor
  FROM e GROUP BY label, bucket, v
),
cross_pairs AS (
  SELECT a.rid AS doc_a, b.rid AS doc_b
  FROM g a JOIN g b
    ON a.label = b.label AND a.bucket = b.bucket
   AND a.rid = a.anchor AND b.rid != b.anchor
  WHERE {cos} >= {Q.COSINE_THRESHOLD}
),
intra_pairs AS (
  SELECT rid AS doc_a, unnest(ids) AS doc_b FROM g
  WHERE len(ids) > 1
    AND round(list_dot_product(v, v) /
        (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(v, v))), 6)
        >= {Q.COSINE_THRESHOLD}
),
pairs AS (
  SELECT doc_a, doc_b FROM cross_pairs
  UNION ALL
  SELECT doc_a, doc_b FROM intra_pairs WHERE doc_a != doc_b
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, x.v FROM reach r JOIN edges x ON r.v = x.u
),
lab AS (
  SELECT u AS doc, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
)
SELECT component, COUNT(*) AS n_members, MIN(doc) AS keep_id
FROM lab GROUP BY component
""",
        "doc_pii_scrub": f"""
WITH {_pii_seeded_sql()}
SELECT doc_id,
  {pii_fns.oracle_count_sql('seeded', pii_fns.EMAIL_RE)} AS n_email,
  {pii_fns.oracle_count_sql('seeded', pii_fns.SSN_RE)} AS n_ssn,
  {pii_fns.oracle_count_sql('seeded', pii_fns.IPV4_RE)} AS n_ipv4,
  {pii_fns.oracle_count_sql('seeded', pii_fns.PHONE_RE)} AS n_phone,
  md5({pii_fns.oracle_scrub_sql('seeded')}) AS scrub_md5,
  length({pii_fns.oracle_scrub_sql('seeded')}) AS scrub_len
FROM seeded
""",
        "docs_tfidf_topk": f"""
WITH tf AS (
  SELECT doc_id AS doc, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents) t
  WHERE tok <> '' GROUP BY 1, 2
),
dfq AS (SELECT term, COUNT(*) AS df_count FROM tf GROUP BY term)
SELECT doc, term, tf, df_count, score, rank FROM (
  SELECT doc, term, tf, df_count,
         CAST(tf AS DOUBLE) / df_count AS score,
         row_number() OVER (PARTITION BY doc
                            ORDER BY CAST(tf AS DOUBLE) / df_count DESC, term) AS rank
  FROM tf JOIN dfq USING (term)
) WHERE rank <= 3
""",
        "docs_search_topk": f"""
WITH hits AS (
  SELECT doc, COUNT(*) AS matched, CAST(SUM(tf) AS BIGINT) AS tf_sum FROM (
    SELECT doc_id AS doc, tok AS term, COUNT(*) AS tf
    FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents) t
    WHERE tok IN ({{terms}}) GROUP BY 1, 2
  ) GROUP BY doc
)
SELECT doc, matched, tf_sum,
       row_number() OVER (ORDER BY matched DESC, tf_sum DESC, doc) AS rank
FROM hits
ORDER BY rank LIMIT 20
""".format(terms=", ".join(f"'{t}'" for t in Q.SEARCH_TERMS)),
        # bigram identity = the PAIR of per-token 60-bit hashes
        # (hashing.h60), mirroring bigram_familiarity's round-11 plan:
        # one md5 per token occurrence, arithmetic pair keys, no string
        # concat per bigram on either engine
        "doc_lm_familiarity": f"""
WITH tok AS (
  SELECT doc_id,
         list_transform(list_filter({_TOKS}, x -> x <> ''),
                        t -> {h60_sql('t')}) AS th
  FROM documents
),
big AS (
  SELECT doc_id AS doc, th[i] AS ha, th[i + 1] AS hb, COUNT(*) AS n
  FROM tok, unnest(generate_series(1, greatest(len(th) - 1, 0))) AS g(i)
  GROUP BY 1, 2, 3
),
model AS (SELECT ha, hb, CAST(SUM(n) AS BIGINT) AS global_n
          FROM big GROUP BY ha, hb)
SELECT doc, CAST(SUM(n * global_n) AS BIGINT) AS fam_total,
       CAST(SUM(n) AS BIGINT) AS n_bigrams
FROM big JOIN model USING (ha, hb) GROUP BY doc
""",
        "emb_kmeans_assign": f"""
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
cents AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v AS c
  FROM (SELECT vec_id, v FROM ev ORDER BY vec_id LIMIT {Q.KMEANS_K})
)
SELECT e.vec_id, c.cid AS cluster,
       list_sum(list_transform(generate_series(1, len(e.v)),
                i -> (e.v[i] - c.c[i]) * (e.v[i] - c.c[i]))) AS dist
FROM ev e CROSS JOIN cents c
QUALIFY row_number() OVER (PARTITION BY e.vec_id ORDER BY dist, c.cid) = 1
""",
        "emb_kmeans": _kmeans_sql(Q.KMEANS_K, Q.EMB_DIM, Q.KMEANS_ITERS)
        + """
SELECT cid AS cluster, COUNT(*) AS n, MIN(vec_id) AS min_vec_id
FROM final GROUP BY cid
""",
        # Rabin-Karp polynomial hash sum c_i*B^(n-1-i) mod 2^61-1 ==
        # Horner walk acc = (acc*B + c) mod p; HUGEINT keeps acc*257+c
        # < 2^70 exact, list_prepend seeds acc=0 so '' -> 0 like the UDF.
        "doc_rolling_fingerprint": """
SELECT doc_id,
  CAST(list_reduce(
    list_prepend(CAST(0 AS HUGEINT),
      list_transform(range(1, length(coalesce(text, '')) + 1),
                     i -> CAST(unicode(coalesce(text, '')[i]) AS HUGEINT))),
    (acc, c) -> (acc * 257 + c) % 2305843009213693951
  ) AS BIGINT) AS rolling_hash
FROM documents
""",
        # every K-char window gets the same Rabin-Karp hash the Spark UDF
        # computes (Horner fold per window; K = queries.PASSAGE_K), then
        # the corpus-wide repeat filter
        "doc_repeated_passages": """
WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
w AS (
  SELECT doc_id, unnest(list_transform(
      range(0, greatest(length(t) - 23, 0)),
      j -> CAST(list_reduce(
             list_prepend(CAST(0 AS HUGEINT),
               list_transform(range(1, 25),
                 i -> CAST(unicode(t[CAST(j + i AS INTEGER)]) AS HUGEINT))),
             (acc, c) -> (acc * 257 + c) % 2305843009213693951
           ) AS BIGINT))) AS fp
  FROM d
)
SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM w GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
""",
        # winnowing replayed in SQL: per-position k-gram hashes (same
        # Horner fold), then each w-window's min via a window frame;
        # leftmost argmin = MIN(pos) among window positions hitting the
        # min; short docs (< w hashes) keep only the s=0 (global) window
        "doc_repeated_passages_winnowed": f"""
WITH d AS (SELECT doc_id, coalesce(text, '') AS t FROM documents),
fp AS (
  SELECT doc_id, CAST(j AS BIGINT) AS pos,
         CAST(list_reduce(
           list_prepend(CAST(0 AS HUGEINT),
             list_transform(range(1, 25),
               i -> CAST(unicode(t[CAST(j + i AS INTEGER)]) AS HUGEINT))),
           (acc, c) -> (acc * 257 + c) % 2305843009213693951
         ) AS BIGINT) AS h
  FROM d, unnest(range(0, greatest(length(t) - 23, 0))) AS u(j)
),
w AS (
  SELECT doc_id, pos AS s, min(h) OVER win AS hmin, count(*) OVER win AS cnt
  FROM fp
  WINDOW win AS (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND {Q.PASSAGE_W - 1} FOLLOWING)
),
fullw AS (SELECT * FROM w WHERE cnt = {Q.PASSAGE_W} OR s = 0),
sel AS (
  SELECT w.doc_id, min(f.pos) AS pos, w.hmin AS fp
  FROM fullw w JOIN fp f
    ON f.doc_id = w.doc_id AND f.h = w.hmin
   AND f.pos BETWEEN w.s AND w.s + {Q.PASSAGE_W - 1}
  GROUP BY w.doc_id, w.s, w.hmin
),
seldist AS (SELECT DISTINCT doc_id, pos, fp FROM sel)
SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ
FROM seldist GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
""",
        # PQ ANN: the codebooks follow the same rounded-Lloyd determinism
        # contract as cluster.kmeans / ivf_index (simsearch.pq_train
        # docstring), so the twin unrolls all m sub-quantizers in one
        # chain and hash-matches the ADC top-k
        "emb_knn_pq": _pq_sql(m=8, ksub=16, iters=5, sample=2048, k=Q.KNN_K),
        # frame kernels: the tiled-text-byte construction (see the helper
        # block above) makes the whole family exact-integer SQL
        "frame_histogram": _histogram_sql(),
        "frame_resize": _resize_sql(),
        "frame_blur": _blur_sql(),
        "frame_encode_png": _encode_png_sql(),
        "multimodal_decode": _multimodal_decode_sql(),
        "video_decode_pruned": _video_decode_sql(),
        # optical flow: the dense float LK numerics aren't SQL, but the
        # stream mapping, stencil alignment, dims, and the REPEAT_EDGE
        # zero-flow boundary contract are — interior flow values stay
        # pinned by the translation-recovery test in tests/test_kernels.py
        "frame_optical_flow": """
SELECT CAST(doc_id % 5 AS VARCHAR) AS stream_id,
       CAST(doc_id // 5 AS BIGINT) AS idx,
       16 AS height, 16 AS width, 2 AS channels, 2048 AS nbytes,
       CASE WHEN doc_id // 5 = 0 THEN 1 ELSE NULL END AS edge_zero_flow
FROM documents
""",
        # (every declared query now has an oracle entry) ->
        # the driver records its rows-only check for these.
    }
