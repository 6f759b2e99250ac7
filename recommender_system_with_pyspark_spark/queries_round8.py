"""Round-8 query surface (VERDICT r7 items #1/#2/#6).

- ``als_id_ceiling_guard`` — hash-checked contract for the general
  ``dense_id_compaction`` operator (the sf10 ALS int32 CAST_OVERFLOW fix,
  promoted out of ``flagship.py``): DuckDB independently computes whether
  the rating key space overflows int32 AND the invariants compaction must
  preserve (row count, per-column distinct counts, post-compaction ids
  fitting int32). At sf0.01 the passthrough branch runs (engaged=false);
  at sf10 the compaction branch runs (engaged=true) — the same query row
  is the sweep-visible witness VERDICT r7 #1 asked for.
- ``multimodal_png_decode`` — REAL pure-stdlib PNG decode (zlib inflate +
  all five scanline unfilters) through the Arrow mapInPandas path; the
  fixture rasters carry the same cycled-text pixels as the BMP entry, so
  the closed-form DuckDB pixel-statistics oracle applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load_table
from .operators import multimodal as M
from .registry import query

_I32 = 2**31 - 1


@query(
    "als_id_ceiling_guard",
    oracle=f"""
    WITH r AS (
        SELECT o_custkey AS user_id, l_partkey AS item_id
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    )
    SELECT (min(user_id) < -{_I32 + 1} OR max(user_id) > {_I32}
         OR min(item_id) < -{_I32 + 1} OR max(item_id) > {_I32}) AS engaged,
           CAST(count(*) AS BIGINT) AS n_ratings,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT item_id) AS BIGINT) AS n_items,
           true AS ids_fit_int32
    FROM r
    """,
)
def als_id_ceiling_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract check for ``operators.relational.dense_id_compaction``
    (VERDICT r7 #1/#2 — the MLlib-ALS int32 id-ceiling fix): run the
    compaction over the flagship's implicit-ratings key space and emit

    - ``engaged`` — whether the compaction branch (vs the exact
      passthrough) ran: driver-side fact from the returned maps; DuckDB
      recomputes the decision rule (any id outside int32) from the data,
      so a wrong branch choice breaks the hash;
    - ``n_ratings`` / ``n_users`` / ``n_items`` — counted on the
      COMPACTED frame vs DuckDB's counts on the original: compaction must
      be a 1:1 re-key that is bijective per id column;
    - ``ids_fit_int32`` — computed from the compacted frame's actual
      min/max: the whole point of the operator, asserted as a literal
      ``true`` by the oracle.

    At sf0.01/sf0.1 ids fit int32, so this hash-pins the passthrough; at
    sf10 (keys ~2.2e9, SCALING.md r7) it exercises dense compaction and
    the same row (engaged=true, ids_fit_int32=true, counts intact) is the
    sweep's green witness that the CAST_OVERFLOW class is closed."""
    from .flagship import implicit_ratings
    from .operators.relational import dense_id_compaction

    ratings = implicit_ratings(spark, sf_dir)
    compact, maps = dense_id_compaction(ratings, ["user_id", "item_id"])
    engaged = maps["user_id"] is not None
    return compact.agg(
        F.lit(engaged).alias("engaged"),
        F.count(F.lit(1)).cast("long").alias("n_ratings"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.countDistinct("item_id").cast("long").alias("n_items"),
        (
            (F.min("user_id") >= F.lit(-_I32 - 1))
            & (F.max("user_id") <= F.lit(_I32))
            & (F.min("item_id") >= F.lit(-_I32 - 1))
            & (F.max("item_id") <= F.lit(_I32))
        ).alias("ids_fit_int32"),
    )


_IMG_W, _IMG_H = 16, 8
_IMG_BYTES = _IMG_W * _IMG_H * 3  # 384

_IMG_BYTE_LIST = (
    f"[ascii(x) for x in string_split(left(repeat(text, "
    f"CAST(ceil({_IMG_BYTES}.0 / length(text)) AS INT)), {_IMG_BYTES}), '')]"
)


@query(
    "multimodal_png_decode",
    oracle=f"""
    WITH px AS (
        SELECT doc_id AS media_id, {_IMG_BYTE_LIST} AS l
        FROM documents WHERE length(text) > 0
    )
    SELECT media_id,
           true AS decoded,
           {_IMG_W} AS width,
           {_IMG_H} AS height,
           round(list_avg(l[1:{_IMG_BYTES}:3]), 6) AS mean_r,
           round(list_avg(l[2:{_IMG_BYTES}:3]), 6) AS mean_g,
           round(list_avg(l[3:{_IMG_BYTES}:3]), 6) AS mean_b,
           round(sqrt(greatest(
               list_avg([x * x for x in l]) - list_avg(l) ^ 2, 0)), 6)
               AS pixel_std
    FROM px
    """,
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode through the Arrow batch path (VERDICT r7 #6):
    document bytes are cycled into the SAME 16×8 RGB raster as the BMP
    entry, container-encoded as a genuine non-interlaced 8-bit truecolor
    PNG (per-row filters cycling None/Sub/Up/Average/Paeth + zlib
    deflate), then decoded back by parsing the chunk stream, inflating
    IDAT, and un-filtering every scanline (operators/multimodal.decode_png
    — pure stdlib zlib + numpy, no codec library). Width/height come from
    IHDR and the channel means from the reconstructed raster, so a chunk
    mis-parse, a broken unfilter (any of the five types), or a row-order
    bug all break the oracle hash. DuckDB recomputes every statistic from
    the text bytes alone — identical closed form to the BMP twin because
    the pixel CONTENT is identical; only the container differs."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = M.text_to_png_media(docs, width=_IMG_W, height=_IMG_H)
    return M.extract_image_features(media)


# JPEG fixture geometry: 64×32 gray = 8×4 = 32 constant 8×8 blocks, one
# cycled text byte per block (row-major).
_JPG_W, _JPG_H = 64, 32
_JPG_BLOCKS = (_JPG_W // 8) * (_JPG_H // 8)  # 32

_JPG_BYTE_LIST = (
    f"[ascii(x) for x in string_split(left(repeat(text, "
    f"CAST(ceil({_JPG_BLOCKS}.0 / length(text)) AS INT)), {_JPG_BLOCKS}), '')]"
)

# The lossy-codec closed form (see operators/jpegcodec.py module doc): a
# constant block v keeps only its DC coefficient 8·(v−128); with Annex K
# Q₀₀ = 16 the decoded block is clamp(2·round((v−128)/2) + 128) — round
# half-away on BOTH sides (the encoder pins its quantizer rounding to SQL's
# rule precisely so this prediction is exact).
_JPG_DECODED = (
    "[least(255.0, greatest(0.0, 2 * round((v - 128) / 2.0) + 128)) "
    f"for v in {_JPG_BYTE_LIST}]"
)


@query(
    "multimodal_jpeg_decode",
    oracle=f"""
    WITH px AS (
        SELECT doc_id AS media_id, {_JPG_DECODED} AS d
        FROM documents WHERE length(text) > 0
    )
    SELECT media_id,
           true AS decoded,
           {_JPG_W} AS width,
           {_JPG_H} AS height,
           round(list_avg(d), 6) AS mean_r,
           round(list_avg(d), 6) AS mean_g,
           round(list_avg(d), 6) AS mean_b,
           round(sqrt(greatest(
               list_avg([x * x for x in d]) - list_avg(d) ^ 2, 0)), 6)
               AS pixel_std
    FROM px
    """,
)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy-codec decode through the Arrow batch path (shrinks the
    codec stub to color-JPEG/MP3 — VERDICT r7 left JPEG as the next item):
    document bytes become one gray value per 8×8 block, encoded as a
    genuine baseline grayscale JPEG (FDCT → Annex-K quantization → zigzag
    → run-length → Huffman, ``operators/jpegcodec.encode_jpeg_gray``) and
    decoded back through the full inverse chain (marker/DQT/DHT parse,
    byte-unstuffed Huffman decode, dequant, de-zigzag, IDCT). Constant
    blocks make the lossy pipeline exactly predictable — only DC survives
    quantization — so DuckDB recomputes every decoded pixel statistic from
    the text in closed form: a Huffman table bug, a zigzag slip, a DC-diff
    chain error, or a quantizer rounding drift all break the hash. The
    64×32 geometry spans 32 blocks per image, so the DC-difference chain
    and EOB path are exercised 32× per document."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = M.text_to_jpeg_media(docs, width=_JPG_W, height=_JPG_H)
    return M.extract_image_features(media)


# Color-JPEG fixture geometry: 48×24 = 6×3 = 18 blocks per image.
_JPGC_W, _JPGC_H = 48, 24
_JPGC_BLOCKS = (_JPGC_W // 8) * (_JPGC_H // 8)  # 18

_JPGC_BYTE_LIST = (
    f"[ascii(x) for x in string_split(left(repeat(text, "
    f"CAST(ceil({_JPGC_BLOCKS}.0 / length(text)) AS INT)), {_JPGC_BLOCKS}), '')]"
)

_JPGC_DECODED = (
    "[least(255.0, greatest(0.0, 2 * round((v - 128) / 2.0) + 128)) "
    f"for v in {_JPGC_BYTE_LIST}]"
)


@query(
    "multimodal_jpeg_color_decode",
    oracle=f"""
    WITH px AS (
        SELECT doc_id AS media_id, {_JPGC_DECODED} AS d
        FROM documents WHERE length(text) > 0
    )
    SELECT media_id,
           true AS decoded,
           {_JPGC_W} AS width,
           {_JPGC_H} AS height,
           round(list_avg(d), 6) AS mean_r,
           round(list_avg(d), 6) AS mean_g,
           round(list_avg(d), 6) AS mean_b,
           round(sqrt(greatest(
               list_avg([x * x for x in d]) - list_avg(d) ^ 2, 0)), 6)
               AS pixel_std
    FROM px
    """,
)
def multimodal_jpeg_color_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full 4:4:4 COLOR JPEG through the Arrow batch path: the grayscale
    entry's cycled-text block values rendered as gray-valued RGB and
    encoded with the complete color pipeline — JFIF YCbCr transform,
    separate luminance/chrominance quant + Huffman tables, interleaved
    Y/Cb/Cr MCUs with three independent DC predictor chains — then decoded
    back through the same inverse chain plus YCbCr→RGB
    (``operators/jpegcodec.encode_jpeg_color``/``decode_jpeg``). Gray
    input pins the chroma planes to exactly 128 (all-zero chroma blocks),
    so every channel's decoded statistics follow the SAME luma closed form
    the DuckDB oracle recomputes from the text — while a broken chroma
    Huffman table, a slipped component interleave, a wrong DC predictor,
    or a color-transform drift all corrupt the hash (chroma errors leak
    into R/G/B through the YCbCr→RGB mix)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = M.text_to_jpeg_color_media(docs, width=_JPGC_W, height=_JPGC_H)
    return M.extract_image_features(media)


# 4:2:0 fixture geometry: 64×32 pixels = 4×2 = 8 sixteen-pixel tiles (one
# tile per MCU) per image.
_JPG420_W, _JPG420_H = 64, 32
_JPG420_TILES = (_JPG420_W // 16) * (_JPG420_H // 16)  # 8

_JPG420_BYTE_LIST = (
    f"[ascii(x) for x in string_split(left(repeat(text, "
    f"CAST(ceil({_JPG420_TILES}.0 / length(text)) AS INT)), {_JPG420_TILES}), '')]"
)

_JPG420_DECODED = (
    "[least(255.0, greatest(0.0, 2 * round((v - 128) / 2.0) + 128)) "
    f"for v in {_JPG420_BYTE_LIST}]"
)


@query(
    "multimodal_jpeg420_decode",
    oracle=f"""
    WITH px AS (
        SELECT doc_id AS media_id, {_JPG420_DECODED} AS d
        FROM documents WHERE length(text) > 0
    )
    SELECT media_id,
           true AS decoded,
           {_JPG420_W} AS width,
           {_JPG420_H} AS height,
           round(list_avg(d), 6) AS mean_r,
           round(list_avg(d), 6) AS mean_g,
           round(list_avg(d), 6) AS mean_b,
           round(sqrt(greatest(
               list_avg([x * x for x in d]) - list_avg(d) ^ 2, 0)), 6)
               AS pixel_std
    FROM px
    """,
)
def multimodal_jpeg420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chroma-SUBSAMPLED 4:2:0 JPEG through the Arrow batch path — the
    layout virtually every camera/web JPEG in a real 100 TB corpus uses,
    and the last sampling variant between the codec and arbitrary baseline
    JPEGs: document bytes become one gray value per 16×16 MCU, encoded
    with 2×2 chroma box-downsampling and four-luma-blocks-per-MCU
    interleave (``jpegcodec.encode_jpeg_420``), decoded back through the
    generic-sampling inverse chain (per-component MCU block geometry,
    plane assembly, nearest-neighbor upsample, YCbCr→RGB). Constant tiles
    keep the subsampled pipeline exactly predictable (constant tiles
    box-average to themselves; gray input zeroes the chroma planes), so
    DuckDB recomputes every decoded statistic from the text — a slipped
    Y-block interleave order, a wrong plane offset, a chroma upsample
    misalignment, or a DC predictor crossing between the four Y blocks
    all break the hash."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    media = M.text_to_jpeg420_media(docs, width=_JPG420_W, height=_JPG420_H)
    return M.extract_image_features(media)


@query(
    "document_chunks",
    oracle="""
    SELECT doc_id,
           CAST(ix AS INT) AS chunk_ix,
           substring(text, CAST(ix * 384 + 1 AS INT), 512) AS chunk_text,
           CAST(length(substring(text, CAST(ix * 384 + 1 AS INT), 512)) AS INT)
               AS chunk_chars_len,
           CAST(length(string_split_regex(
               trim(substring(text, CAST(ix * 384 + 1 AS INT), 512)), '\\s+'))
               AS INT) AS chunk_tokens
    FROM documents,
         LATERAL (SELECT unnest(range(greatest(1, CAST(ceil(
             (length(text) - 128) / 384.0) AS BIGINT)))) AS ix)
    WHERE length(text) > 0
    """,
)
def document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG / long-context chunker over the documents corpus: 512-char windows
    with 128-char overlap (stride 384), one output row per chunk with its
    char and whitespace-token budget — the operator that fronts every
    embedding/indexing pass over a training corpus. The plan is pure
    whole-stage-codegen row expansion (sequence → posexplode → substring):
    no shuffle, no Python, no window — scan-parallel at any corpus size.
    DuckDB recomputes every window boundary, the overlap rule, and the
    token counts from the raw text (operators/text.chunk_documents)."""
    from .operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return chunk_documents(docs, "doc_id", "text", chunk_chars=512, overlap=128)


# --- round-8b: corpus text normalization + tokenizer-apply -----------------

# Decomposed-fixture construction, identical on both sides: every 'e' gains
# a combining acute (U+0301), every 'a' a combining grave (U+0300) — the
# decomposed byte forms real web text arrives in. NFC must re-compose them
# to U+00E9 / U+00E0.
_NFC_DECOMPOSED_SQL = (
    "replace(replace(text, 'e', 'e' || chr(769)), 'a', 'a' || chr(768))"
)


@query(
    "unicode_nfc_normalize",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_NFC_DECOMPOSED_SQL} AS dec
        FROM documents WHERE length(text) > 0
    )
    SELECT doc_id,
           CAST(length(dec) AS INT) AS len_decomposed,
           CAST(length(nfc_normalize(dec)) AS INT) AS len_nfc,
           md5(nfc_normalize(dec)) AS nfc_md5
    FROM d
    """,
)
def unicode_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization over the corpus — the canonical first pass
    before any exact-dedup fingerprint or tokenizer sees multilingual web
    text (composed vs decomposed encodings of the same visible string hash
    differently). The fixture decomposes the documents deterministically
    JVM-side (combining acute after 'e', combining grave after 'a'), then
    ``text.normalize_unicode`` re-composes via an Arrow-batched
    ``unicodedata.normalize`` projection — no shuffle, linear in the scan.
    The DuckDB oracle recomputes NFC with its own independent Unicode
    implementation (utf8proc's ``nfc_normalize``), so the md5 hash pins
    CPython and utf8proc to byte-identical normalization output."""
    from .operators.text import normalize_unicode

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    dec = docs.select(
        "doc_id",
        F.replace(
            F.replace(F.col("text"), F.lit("e"), F.lit("é")),
            F.lit("a"),
            F.lit("à"),
        ).alias("dec"),
    )
    out = normalize_unicode(dec, id_col="doc_id", text_col="dec", out_col="nfc")
    return out.select(
        "doc_id",
        F.length("dec").alias("len_decomposed"),
        F.length("nfc").alias("len_nfc"),
        F.md5(F.col("nfc").cast("binary")).alias("nfc_md5"),
    )


def _bpe_replace_chain_sql() -> str:
    """The DuckDB twin of the fast-path replace chain, generated from the
    SAME merge table the Spark side applies (single source of truth)."""
    from .operators.text import DEFAULT_BPE_MERGES

    def lit(sym: str) -> str:
        parts = [
            f"chr({ord(ch)})" if ord(ch) >= 0xE000 else f"'{ch}'" for ch in sym
        ]
        return " || ".join(parts)

    expr = "text"
    for left, right, out in DEFAULT_BPE_MERGES:
        expr = f"replace({expr}, {lit(left + right)}, {lit(out)})"
    return expr


@query(
    "bpe_encode_documents",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS INT) AS n_chars,
           CAST(length({_bpe_replace_chain_sql()}) AS INT) AS bpe_tokens,
           round(length(text) / length({_bpe_replace_chain_sql()}), 6)
               AS chars_per_token,
           md5({_bpe_replace_chain_sql()}) AS bpe_md5
    FROM documents WHERE length(text) > 0
    """,
)
def bpe_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL byte-pair-encoding application over the corpus — the
    token-budget primitive behind mixture weights, packing budgets and
    per-source token accounting (``text.bpe_apply``). The rank-ordered
    merge table (with chained merges: th→the, an→and) is PROVEN
    replace-chain-equivalent to greedy BPE by the operator's driver-side
    validator, so the execution plan is a pure whole-stage-codegen
    ``F.replace`` chain: zero Python, zero shuffle, token counting rides
    the corpus scan — the 100 TB path. DuckDB applies the identical chain
    generated from the same table object; the md5 of the encoded symbol
    string pins every merge's rank order, leftmost-first tie handling, and
    chained-merge composition."""
    from .operators.text import DEFAULT_BPE_MERGES, bpe_apply

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    enc = bpe_apply(docs, DEFAULT_BPE_MERGES)
    return enc.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.col("bpe_tokens"),
        F.round(F.length("text") / F.col("bpe_tokens"), 6).alias("chars_per_token"),
        F.md5(F.col("bpe_text").cast("binary")).alias("bpe_md5"),
    )


@query(
    "hybrid_search_rrf",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE term IN ('join', 'hash', 'filter') GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    stats AS (
        SELECT count(*)::DOUBLE AS n_docs,
               avg(len(string_split_regex(trim(lower(text)), '\\s+'))) AS avgdl
        FROM documents
    ),
    dl AS (
        SELECT doc_id, len(string_split_regex(trim(lower(text)), '\\s+'))::DOUBLE AS dl
        FROM documents
    ),
    bm25 AS (
        SELECT tf.doc_id,
               round(sum(
                   ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
                   * (tf.tf * 2.2)
                   / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))
               ), 6) AS score
        FROM tf JOIN dfreq d USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
        GROUP BY tf.doc_id
    ),
    lex AS (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
        FROM bm25 ORDER BY score DESC, doc_id ASC LIMIT 50
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cos AS (
        SELECT c.vec_id AS doc_id,
               round(list_cosine_similarity(q.v, c.v), 6) AS sim
        FROM e q JOIN e c ON q.vec_id = 0 AND c.vec_id <> 0
    ),
    sem AS (
        SELECT doc_id, row_number() OVER (ORDER BY sim DESC, doc_id ASC) AS rnk
        FROM cos ORDER BY sim DESC, doc_id ASC LIMIT 50
    ),
    fused AS (
        SELECT doc_id, round(sum(c), 6) AS rrf_score,
               CAST(count(*) AS INT) AS n_lists
        FROM (
            SELECT doc_id, 1.0 / (60 + rnk) AS c FROM lex
            UNION ALL
            SELECT doc_id, 1.0 / (60 + rnk) AS c FROM sem
        ) GROUP BY doc_id
    )
    SELECT doc_id, rrf_score, n_lists FROM fused
    ORDER BY rrf_score DESC, doc_id ASC LIMIT 20
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — THE RAG-serving query shape: BM25 lexical top-50
    (query {join, hash, filter}) fused with embedding-cosine top-50
    (query vector = embedding 0) by reciprocal-rank fusion
    (``relational.rrf_fuse``, k0=60), final top-20. Scale shape: each leg
    is its own already-scale-safe ranker (BM25's pre-shuffle term filter +
    TakeOrdered; brute-force cosine here, swappable for the LSH/IVF ANN
    operators at catalog scale); fusion itself is O(k) rows — a union +
    one map-side-combined groupBy, no calibration join web. Both leg
    rankings, the 1/(60+rank) arithmetic, tie handling, and the
    fusion-coverage count are all recomputed closed-form by DuckDB."""
    from .operators.relational import rrf_fuse, small_frame_ranks
    from .operators.similarity import cosine_topk
    from .operators.text import bm25_rank

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    lex = small_frame_ranks(
        bm25_rank(docs, ["join", "hash", "filter"], "text", "doc_id", k=50),
        order_by=[("score", "desc"), ("doc_id", "asc")],
    ).select("doc_id", "rank")
    sem = (
        cosine_topk(emb.filter(F.col("vec_id") == 0), emb, "vec_id", "embedding", k=50)
        .select(F.col("neighbor_id").alias("doc_id"), "rank")
    )
    fused = rrf_fuse([lex, sem], id_col="doc_id", rank_col="rank", k0=60)
    return (
        fused.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "rrf_score", "n_lists")
    )


@query(
    "mutual_information_pairs",
    oracle="""
    WITH pairs AS (
        SELECT 'status|priority' AS pair, o_orderstatus AS x, o_orderpriority AS y FROM orders
        UNION ALL
        SELECT 'segment|nation', c_mktsegment, CAST(c_nationkey AS VARCHAR) FROM customer
        UNION ALL
        SELECT 'lang|source', lang, source FROM documents
    ),
    joint AS (
        SELECT pair, x, y, count(*)::DOUBLE AS cxy FROM pairs GROUP BY 1, 2, 3
    ),
    mx AS (SELECT pair, x, sum(cxy) AS cx FROM joint GROUP BY 1, 2),
    my AS (SELECT pair, y, sum(cxy) AS cy FROM joint GROUP BY 1, 2),
    tot AS (SELECT pair, sum(cxy) AS n FROM joint GROUP BY 1)
    SELECT j.pair,
           round(sum((cxy / n) * log2((cxy / n) / ((cx / n) * (cy / n)))), 6) AS mi_bits,
           round(CASE WHEN -sum((cxy / n) * log2(cx / n)) > 0
                       AND -sum((cxy / n) * log2(cy / n)) > 0
                 THEN sum((cxy / n) * log2((cxy / n) / ((cx / n) * (cy / n))))
                      / sqrt((-sum((cxy / n) * log2(cx / n)))
                             * (-sum((cxy / n) * log2(cy / n))))
                 END, 6) AS nmi,
           CAST(sum(cxy) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_cells
    FROM joint j JOIN mx USING (pair, x) JOIN my USING (pair, y) JOIN tot USING (pair)
    GROUP BY j.pair
    """,
)
def mutual_information_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information + normalized MI for three categorical feature
    pairs across tables (``ml/stats.mutual_information``) — the
    feature-selection / redundancy score the reference's ChiSquareTest
    (M7) surface doesn't provide. Each pair costs one partial-aggregating
    groupBy to its joint-frequency frame; marginals, entropies, and the
    MI fold run on that tiny frame (broadcast joins, no second fact
    scan). DuckDB recomputes the full probability algebra — joint,
    marginals, log-ratio fold, entropy normalization, the zero-entropy
    null guard — in closed form."""
    from .ml.stats import mutual_information

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")
    out = (
        mutual_information(orders, "o_orderstatus", "o_orderpriority", "status|priority")
        .unionByName(
            mutual_information(
                cust.withColumn("_nat", F.col("c_nationkey").cast("string")),
                "c_mktsegment",
                "_nat",
                "segment|nation",
            )
        )
        .unionByName(mutual_information(docs, "lang", "source", "lang|source"))
    )
    return out


@query(
    "negative_sample_interactions",
    oracle="""
    WITH pos AS (
        SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    items AS (
        SELECT item_id, row_number() OVER (ORDER BY item_id) - 1 AS idx
        FROM (SELECT DISTINCT item_id FROM pos)
    ),
    n AS (SELECT count(*) AS cnt FROM items),
    draws AS (
        SELECT u.user_id, t.j,
               CAST(('0x' || substr(md5(u.user_id || ':' || t.j || ':5'), 1, 8))
                    AS BIGINT) % n.cnt AS idx
        FROM (SELECT DISTINCT user_id FROM pos) u, range(12) t(j), n
    ),
    cand AS (
        SELECT d.user_id, i.item_id, d.j FROM draws d JOIN items i USING (idx)
    ),
    neg AS (
        SELECT c.user_id, c.item_id, min(c.j) AS j
        FROM cand c
        ANTI JOIN pos p ON c.user_id = p.user_id AND c.item_id = p.item_id
        GROUP BY c.user_id, c.item_id
    )
    SELECT user_id, item_id, CAST(neg_rank AS INT) AS neg_rank
    FROM (
        SELECT user_id, item_id,
               row_number() OVER (PARTITION BY user_id ORDER BY j) AS neg_rank
        FROM neg
    ) WHERE neg_rank <= 4
    """,
)
def negative_sample_interactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling over the customer×part interaction
    graph (``sampling.negative_sample``, k=4, 3× oversample, seed=5) — the
    absence-defined half of every implicit-feedback training set (BPR /
    ranking ALS / two-tower contrastive batches). DuckDB independently
    replays the whole construction — dense item indexing, the
    md5(user:draw:seed) draw sequence, positive anti-join, earliest-draw
    dedup, per-user rank cut — so the hash pins that Spark's negatives
    are exactly the portable construction, not an RNG artifact."""
    from .operators.partitioning import spread_small_input
    from .operators.sampling import negative_sample

    orders = load_table(spark, sf_dir, "orders")
    # single-split fixture scan: lineitem is the STREAM side of the
    # broadcast join feeding the positives distinct — spread it so the
    # join + partial-distinct map side uses every core (no-op at scale)
    lineitem = spread_small_input(
        load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey"),
        "l_orderkey",
    )
    inter = orders.join(
        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
    ).select(
        F.col("o_custkey").alias("user_id"), F.col("l_partkey").alias("item_id")
    )
    return negative_sample(inter, "user_id", "item_id", k=4, oversample=3, seed=5)


# Shared by the batch query and its streaming twin: the streaming state
# store holds the SAME cells, so both hash against one closed form.
_CMS_ORACLE = """
    WITH keys AS (SELECT CAST(user_id AS VARCHAR) AS k FROM events),
    cells AS (
        SELECT t.r AS sketch_row,
               CAST(('0x' || substr(md5(k || ':cms5' || ':' || t.r), 1, 8))
                    AS BIGINT) % 64 AS bucket,
               CAST(count(*) AS BIGINT) AS cnt
        FROM keys, range(4) t(r)
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt FROM events
        GROUP BY user_id ORDER BY true_cnt DESC, user_id ASC LIMIT 20
    ),
    probe_cells AS (
        SELECT p.user_id, p.true_cnt, t.r AS sketch_row,
               CAST(('0x' || substr(md5(CAST(p.user_id AS VARCHAR) || ':cms5' || ':' || t.r), 1, 8))
                    AS BIGINT) % 64 AS bucket
        FROM truth p, range(4) t(r)
    )
    SELECT p.user_id, p.true_cnt,
           min(coalesce(c.cnt, 0)) AS est_cnt,
           CAST(min(coalesce(c.cnt, 0)) - p.true_cnt AS BIGINT) AS overcount,
           min(coalesce(c.cnt, 0)) >= p.true_cnt AS never_undercounts
    FROM probe_cells p LEFT JOIN cells c USING (sketch_row, bucket)
    GROUP BY p.user_id, p.true_cnt
    """


@query("cms_user_counts", oracle=_CMS_ORACLE)
def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–Min sketch frequency estimation over the event stream
    (``operators/sketches``, depth=4, width=64 — deliberately tight so
    collisions actually occur and the overcount column is non-trivial):
    build the mergeable sketch table with one partial-aggregating groupBy
    (state capped at 256 cells no matter how many distinct users), then
    estimate the true top-20 users' counts from the sketch alone. The
    sketch is md5-deterministic, so DuckDB rebuilds EVERY cell and every
    min-estimate bit-for-bit — including the structural never-undercount
    guarantee — while the exact-vs-estimate deltas document the ε·N error
    a 256-cell summary of the whole stream costs."""
    from .operators.sketches import cms_estimate, count_min_table

    ev = load_table(spark, sf_dir, "events")
    sketch = count_min_table(ev, "user_id", depth=4, width=64, seed=5)
    truth = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("user_id"))
        .limit(20)
    )
    est = cms_estimate(sketch, truth, "user_id", depth=4, width=64, seed=5)
    return truth.join(est, "user_id").select(
        "user_id",
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).cast("long").alias("overcount"),
        (F.col("est_cnt") >= F.col("true_cnt")).alias("never_undercounts"),
    )


def _bpe_step_sql(k: int) -> str:
    """CTE block for BPE-training step k: count whitespace-free positional
    char pairs of corpus state c{k}, pick (max count, lexicographically
    smallest), rewrite the corpus for step k+1."""
    return f"""
    p{k} AS (
        SELECT substring(s, CAST(i AS INT), 2) AS pair, count(*) AS c
        FROM c{k}, LATERAL (SELECT unnest(range(1, length(s))) AS i)
        WHERE NOT contains(substring(s, CAST(i AS INT), 2), ' ')
        GROUP BY 1
    ),
    b{k} AS (SELECT pair, c FROM p{k} ORDER BY c DESC, pair ASC LIMIT 1),
    c{k + 1} AS (
        SELECT replace(s, (SELECT pair FROM b{k}), chr({0xE100 + k})) AS s
        FROM c{k}
    )"""


@query(
    "bpe_train_merges",
    oracle=f"""
    WITH c0 AS (SELECT text AS s FROM documents WHERE length(text) > 1),
    {",".join(_bpe_step_sql(k) for k in range(3))}
    SELECT 0 AS step, pair, CAST(c AS BIGINT) AS pair_count, {0xE100} AS new_cp FROM b0
    UNION ALL
    SELECT 1, pair, CAST(c AS BIGINT), {0xE101} FROM b1
    UNION ALL
    SELECT 2, pair, CAST(c AS BIGINT), {0xE102} FROM b2
    """,
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer TRAINING over the corpus (``text.bpe_train``, 3
    merges) — the iterative learn-the-vocabulary loop, distributed: each
    round is one posexplode pair-count groupBy (map-side combined, 2-char
    shuffle keys), a 1-row TakeOrdered argmax (the only driver traffic,
    same pattern as the k-means centroid collect), and a pure-projection
    corpus rewrite, localCheckpointed so round k never replays rounds
    0..k−1. Deterministic by construction (count-desc, pair-asc
    tie-break; fresh PUA output symbols), so DuckDB unrolls the SAME
    three rounds in closed form — including chained merges whose pairs
    contain round-0/1 output symbols — and the hash pins the argmax, the
    tie rule, the whitespace-boundary exclusion, and the rewrite."""
    from .operators.text import bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=3)
    return spark.createDataFrame(
        [(s, p, c, ord(o)) for s, p, c, o in merges],
        "step int, pair string, pair_count long, new_cp int",
    )


_DECAY_REF_US = 1706745600000000  # 2024-02-01T00:00:00Z, just past max(events.ts)


@query(
    "decayed_user_activity",
    oracle=f"""
    SELECT user_id,
           round(sum(exp(-ln(2) / 7.0 * (({_DECAY_REF_US} - epoch_us(ts)) / 86400000000.0))), 6)
               AS decayed_count,
           round(sum(exp(-ln(2) / 7.0 * (({_DECAY_REF_US} - epoch_us(ts)) / 86400000000.0)) * value), 6)
               AS decayed_value,
           CAST(count(*) AS BIGINT) AS n_events,
           max(ts) AS last_ts
    FROM events
    WHERE epoch_us(ts) < {_DECAY_REF_US}
    GROUP BY user_id
    """,
)
def decayed_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed per-user activity features
    (``temporal.decayed_agg``, 7-day half-life, explicit as-of reference
    instant — never now()): recency-weighted event count and decayed value
    sum in ONE scan + ONE partial-aggregating groupBy, no windowed
    backfill, linear at any history depth; events at/after the reference
    are excluded (point-in-time correctness). DuckDB recomputes the
    half-life weights and both decayed sums in closed form."""
    from .operators.temporal import decayed_agg

    ev = load_table(spark, sf_dir, "events")
    return decayed_agg(
        ev, "user_id", "ts", ref_ts_us=_DECAY_REF_US,
        half_life_days=7.0, value_col="value",
    )


# Boilerplate fixture: three 100-char content chunks + one universal footer
# + one per-language footer + one per-source footer, newline-joined — the
# multi-line web-document shape the flat synthetic corpus lacks. At 10%:
# universal (100%) and lang footers (13-44%) strip, source footers (5%) and
# content chunks stay.
_BP_LINES_SQL = (
    "concat_ws(chr(10), substring(text, 1, 100), substring(text, 101, 100), "
    "substring(text, 201, 100), 'subscribe to our newsletter', "
    "'copyright ' || lang, 'source: ' || source)"
)


@query(
    "strip_boilerplate_docs",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id, {_BP_LINES_SQL} AS t
        FROM documents WHERE length(text) > 0
    ),
    split_ AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM raw),
    lines AS (
        SELECT doc_id, CAST(i AS INT) AS pos, ls[CAST(i AS INT)] AS line
        FROM split_, LATERAL (SELECT unnest(generate_series(1, len(ls))) AS i)
        WHERE length(ls[CAST(i AS INT)]) > 0
    ),
    dfreq AS (SELECT line, count(DISTINCT doc_id) AS d FROM lines GROUP BY 1),
    -- denominator matches the operator's contract: docs with >=1 non-empty
    -- line (a delimiter-only doc must not dilute the boilerplate bar)
    n AS (SELECT count(DISTINCT doc_id) AS nd FROM lines),
    boiler AS (SELECT line FROM dfreq, n WHERE d >= 0.10 * nd),
    kept AS (
        SELECT l.doc_id, l.pos, l.line FROM lines l
        ANTI JOIN boiler b ON l.line = b.line
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    ),
    totals AS (SELECT doc_id, count(*) AS n_total FROM lines GROUP BY doc_id)
    SELECT t.doc_id,
           md5(coalesce(r.clean, '')) AS clean_md5,
           CAST(coalesce(r.n_kept, 0) AS INT) AS n_lines_kept,
           CAST(t.n_total - coalesce(r.n_kept, 0) AS INT) AS n_lines_removed
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def strip_boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate stripping (``text.strip_boilerplate``,
    10% document-frequency bar) over a deterministically synthesized
    multi-line corpus: every document gains a universal footer (100% df —
    stripped), a per-language footer (13–44% — stripped), and a
    per-source footer (5% — KEPT, below the bar), around its real content
    chunks. Line df counts shuffle md5 keys only; the boilerplate set is
    broadcast (small by construction); reassembly preserves line order.
    DuckDB replays the fixture construction, the df threshold, the
    anti-join, and the ordered rebuild — the md5 of every cleaned
    document pins all of it."""
    from .operators.text import strip_boilerplate

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    multi = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.substring("text", 1, 100),
            F.substring("text", 101, 100),
            F.substring("text", 201, 100),
            F.lit("subscribe to our newsletter"),
            F.concat(F.lit("copyright "), F.col("lang")),
            F.concat(F.lit("source: "), F.col("source")),
        ).alias("text"),
    )
    out = strip_boilerplate(multi, min_doc_frac=0.10)
    return out.select(
        "doc_id",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
        "n_lines_kept",
        "n_lines_removed",
    )


@query("stream_cms_user_counts", oracle=_CMS_ORACLE)
def stream_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING Count–Min: the sketch cells are a pure per-row projection
    (``sketches.cms_cells``), so piping the event STREAM through them and
    a complete-mode groupBy makes the streaming state store itself the
    sketch — bounded at depth×width entries FOREVER, the textbook use of
    a mergeable sketch (per-micro-batch partial sketches fold into state
    cell-wise, exactly the operator's map-side combine). The streamed
    sketch must equal the batch sketch bit-for-bit on bounded input, so
    this entry hashes against the SAME closed-form oracle as
    ``cms_user_counts`` — a streaming state bug, a lost micro-batch, or a
    double-counted replay all break the hash."""
    from .operators.sketches import cms_cells, cms_estimate
    from .streaming.windows import run_to_memory_sink, stream_events

    ev_stream = stream_events(spark, sf_dir)
    sketch_stream = (
        cms_cells(ev_stream, "user_id", depth=4, width=64, seed=5)
        .groupBy("sketch_row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    sketch = run_to_memory_sink(sketch_stream, "complete")

    ev = load_table(spark, sf_dir, "events")
    truth = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("user_id"))
        .limit(20)
    )
    est = cms_estimate(sketch, truth, "user_id", depth=4, width=64, seed=5)
    return truth.join(est, "user_id").select(
        "user_id",
        "true_cnt",
        "est_cnt",
        (F.col("est_cnt") - F.col("true_cnt")).cast("long").alias("overcount"),
        (F.col("est_cnt") >= F.col("true_cnt")).alias("never_undercounts"),
    )


@query(
    "k_anonymity_audit",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS group_size
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    HAVING count(*) < 8
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifier combinations
    (``quality.k_anonymity_audit``, k=8 on (nation, segment)): any
    combination shared by fewer than k individuals is a re-identification
    risk the release pipeline must suppress or generalize. One
    partial-aggregating groupBy over the quasi columns; output is only
    the RISKY groups (bounded by construction — at most n_rows/k such
    groups can exist), so the audit result is always collectable no
    matter the table size."""
    from .operators.quality import k_anonymity_audit as audit

    cust = load_table(spark, sf_dir, "customer")
    return audit(cust, ["c_nationkey", "c_mktsegment"], k=8)


@query(
    "bpe_roundtrip_docs",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, true AS roundtrip_ok
    FROM documents WHERE length(text) > 0
    """,
)
def bpe_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer LOSSLESSNESS gate: encode the whole corpus with the BPE
    merge table, decode it back (``text.bpe_apply`` → ``text.bpe_decode``,
    both pure codegen replace chains), and hash the DECODED text against
    DuckDB's md5 of the ORIGINAL — the end-to-end proof that tokenization
    loses nothing, the property every training pipeline silently assumes
    and never checks at corpus scale. ``roundtrip_ok`` additionally
    compares decoded == original inside Spark so a failure is legible
    row-by-row, while the oracle hash enforces it corpus-wide."""
    from .operators.text import DEFAULT_BPE_MERGES, bpe_apply, bpe_decode

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    enc = bpe_apply(docs, DEFAULT_BPE_MERGES)
    dec = bpe_decode(enc, DEFAULT_BPE_MERGES)
    return dec.select(
        "doc_id",
        F.md5(F.col("decoded_text").cast("binary")).alias("text_md5"),
        (F.col("decoded_text") == F.col("text")).alias("roundtrip_ok"),
    )


@query(
    "embedding_truncate_topk",
    oracle="""
    WITH e AS (
        SELECT vec_id, (embedding::DOUBLE[])[1:16] AS v FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               round(list_cosine_similarity(q.v, c.v), 6) AS sim
        FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
    )
    SELECT query_id, neighbor_id, sim, CAST(rnk AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= 5
    """,
)
def embedding_truncate_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-tier retrieval: cosine top-5 computed on 16-of-64-dim
    PREFIX-truncated embeddings (``similarity.truncate_embeddings``) —
    the coarse tier of a coarse-search-fine-rerank pipeline (search at a
    prefix dimension for 4× less compute and memory bandwidth, re-rank
    survivors at full width; pairs with `ann_*` operators at catalog
    scale). Truncation is a pure native slice projection; ranking reuses
    the exact brute-force scorer, so DuckDB recomputes the truncated
    similarities and the ranking in closed form."""
    from .operators.similarity import cosine_topk, truncate_embeddings

    emb = truncate_embeddings(
        load_table(spark, sf_dir, "embeddings"), "embedding", dim=16,
        renormalize=False,
    )
    queries = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(queries, emb, "vec_id", "embedding", k=5)


@query(
    "calibration_orders",
    oracle="""
    WITH scored AS (
        SELECT least(1.0, greatest(0.0, o_totalprice / 500000.0)) AS s,
               CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
        FROM orders
    ),
    binned AS (
        SELECT CAST(least(9, floor(s * 10)) AS INT) AS bin, s, y FROM scored
    ),
    per_bin AS (
        SELECT bin, CAST(count(*) AS BIGINT) AS n, avg(s) AS ms, avg(y) AS pr,
               sum((s - y) * (s - y)) AS sqerr
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT sum(n) AS n_tot, sum(n * abs(ms - pr)) AS gap_w,
               sum(sqerr) AS sq_tot
        FROM per_bin
    )
    SELECT bin, n, round(ms, 6) AS mean_score, round(pr, 6) AS positive_rate,
           round(abs(ms - pr), 6) AS abs_gap,
           round(gap_w / n_tot, 6) AS ece,
           round(sq_tot / n_tot, 6) AS brier
    FROM per_bin, tot
    """,
)
def calibration_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability report (``ml/stats.calibration_report``,
    10 bins): a deterministic price-derived score in [0,1] against the
    order-fulfillment label — per-bin mean-predicted vs observed rate,
    expected calibration error, Brier score. The evaluator family's
    missing member next to AUC (M19–M21): ranking quality says nothing
    about whether 0.9 MEANS 90%. One groupBy to a ≤10-row bucket frame;
    DuckDB recomputes buckets, gaps, ECE and Brier in closed form."""
    from .ml.stats import calibration_report

    orders = load_table(spark, sf_dir, "orders")
    scored = orders.select(
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col("o_totalprice") / 500000.0)).alias("score"),
        (F.col("o_orderstatus") == "F").alias("label"),
    )
    return calibration_report(scored, "score", "label", n_bins=10)


@query(
    "stream_decayed_features",
    oracle=f"""
    SELECT user_id,
           round(sum(exp(-ln(2) / 7.0 * (({_DECAY_REF_US} - epoch_us(ts)) / 86400000000.0))), 6)
               AS decayed_count,
           round(sum(exp(-ln(2) / 7.0 * (({_DECAY_REF_US} - epoch_us(ts)) / 86400000000.0)) * value), 6)
               AS decayed_value,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    WHERE epoch_us(ts) < {_DECAY_REF_US}
    GROUP BY user_id
    """,
)
def stream_decayed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING twin of ``decayed_user_activity``: per-user decayed
    features as a NATIVE update-mode streaming aggregation
    (``streaming/windows.decayed_user_features_native``). Fixed-reference
    accumulation makes the decayed sums plain associative SUMs of a
    projected per-row weight, so the plan is the engine's own streaming
    HashAggregate + StateStoreSave — JVM state, map-side partial agg per
    micro-batch, zero Python in the hot path (the applyInPandasWithState
    twin, ``stateful.decayed_user_features``, remains as the documented
    demo of the custom-state surface and is pinned equal in tests). The
    LAST emission per user (the event count is monotone) must equal the
    batch closed form, and the entry hashes against the same DuckDB
    oracle as the batch twin. A state-store bug, a dropped micro-batch,
    or a double replay breaks the hash."""
    from .streaming.windows import (
        decayed_user_features_native,
        run_to_memory_sink,
        stream_events,
    )

    ev = stream_events(spark, sf_dir)
    updates = run_to_memory_sink(
        decayed_user_features_native(ev, ref_ts_us=_DECAY_REF_US, half_life_days=7.0),
        "update",
    )
    return (
        updates.groupBy("user_id")
        .agg(
            F.round(F.max_by("decayed_count", "n_events"), 6).alias("decayed_count"),
            F.round(F.max_by("decayed_value", "n_events"), 6).alias("decayed_value"),
            F.max("n_events").alias("n_events"),
        )
        .filter(F.col("n_events") > 0)
    )


@query(
    "point_in_time_features",
    oracle="""
    WITH labels AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    feats AS (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY value DESC) AS rn
        FROM events WHERE event_type = 'view'
    ),
    fd AS (SELECT user_id, ts, value FROM feats WHERE rn = 1),
    shifted AS (
        SELECT event_id, user_id, ts,
               to_timestamp(CAST(epoch_us(ts) - 3600000000 AS BIGINT) / 1000000.0)
                   AS pit_ts
        FROM labels
    )
    SELECT s.event_id, s.user_id,
           round(f.value, 2) AS last_view_value
    FROM shifted s ASOF LEFT JOIN fd f
    ON s.user_id = f.user_id AND s.pit_ts >= f.ts
    """,
)
def point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free feature join (``temporal.point_in_time_join``, 1-hour
    embargo): every purchase gets the user's latest view-event value that
    was SERVABLE an hour before the purchase — features younger than the
    embargo horizon are exactly the ones an online store could not have
    materialized yet, and training on them is silent leakage. One
    |L|+|R| key shuffle (as-of union machinery, no per-key cross
    product); LEFT semantics keeps every label. DuckDB recomputes the
    embargo shift and the ASOF match."""
    from .operators.temporal import point_in_time_join

    ev = load_table(spark, sf_dir, "events")
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    feats = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    out = point_in_time_join(
        labels, feats,
        label_key="user_id", feature_key="user_id",
        label_time="ts", feature_time="ts",
        payload_cols=["value"], embargo_seconds=3600,
    )
    return out.select(
        "event_id", "user_id", F.round("value", 2).alias("last_view_value")
    )


@query(
    "rolling_origin_folds",
    oracle="""
    WITH rng AS (
        SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 FROM events
    ),
    x AS (
        SELECT e.event_id, epoch_us(e.ts) AS t, r.t0,
               (r.t1 - r.t0)::DOUBLE AS span, f.fold
        FROM events e CROSS JOIN rng r,
             LATERAL (SELECT unnest(range(3)) AS fold) f
    ),
    tagged AS (
        SELECT fold,
               CASE
                 WHEN t < t0 + span * (0.5 + fold * (0.5 / 3)) THEN 'train'
                 WHEN t >= t0 + span * (0.5 + fold * (0.5 / 3))
                  AND (t < t0 + span * (0.5 + (fold + 1) * (0.5 / 3))
                       OR (fold = 2 AND t <= t0 + span)) THEN 'test'
               END AS role,
               t
        FROM x
    )
    SELECT CAST(fold AS INT) AS fold, role,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(t) AS BIGINT) AS min_ts_us,
           CAST(max(t) AS BIGINT) AS max_ts_us
    FROM tagged WHERE role IS NOT NULL
    GROUP BY fold, role
    """,
)
def rolling_origin_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) temporal cross-validation
    (``sampling.rolling_origin_folds``, 3 folds, 50% minimum train span):
    the CV scheme that respects causality — fold i trains on everything
    before time-cut i and tests on the span [cut_i, cut_{i+1}) — where
    vanilla k-fold silently trains on the future. Cuts are affine in
    TIME (not row quantiles), so they are deterministic arithmetic both
    engines reproduce; the per-(fold, role) row counts and micros
    boundaries pin every cut, the half-open window rule, and the
    closed top of the last fold."""
    from .operators.sampling import rolling_origin_folds as rof

    ev = load_table(spark, sf_dir, "events")
    folds = rof(ev, "ts", n_folds=3, min_train_frac=0.5)
    return folds.groupBy("fold", "role").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min(F.unix_micros("ts")).alias("min_ts_us"),
        F.max(F.unix_micros("ts")).alias("max_ts_us"),
    )


@query(
    "schema_drift_orders",
    oracle="""
    WITH b AS (
        SELECT count(*) AS n,
               sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS o_orderkey,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS o_custkey,
               sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS o_orderstatus,
               sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS o_totalprice,
               sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS o_orderdate
        FROM orders WHERE o_orderstatus = 'F'
    ),
    a AS (
        SELECT count(*) AS n,
               sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS o_orderkey,
               sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS o_custkey,
               sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS o_orderstatus,
               sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS o_totalprice,
               sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS o_orderpriority
        FROM orders
    )
    SELECT * FROM (
        SELECT 'o_custkey' AS column, 'common' AS status,
               round(b.o_custkey / b.n, 6) AS null_rate_before,
               round(a.o_custkey / a.n, 6) AS null_rate_after,
               round(a.o_custkey / a.n - b.o_custkey / b.n, 6) AS null_rate_delta
        FROM b, a
        UNION ALL SELECT 'o_orderdate', 'removed', round(b.o_orderdate / b.n, 6), NULL, NULL FROM b
        UNION ALL SELECT 'o_orderkey', 'common', round(b.o_orderkey / b.n, 6),
               round(a.o_orderkey / a.n, 6), round(a.o_orderkey / a.n - b.o_orderkey / b.n, 6) FROM b, a
        UNION ALL SELECT 'o_orderpriority', 'added', NULL, round(a.o_orderpriority / a.n, 6), NULL FROM a
        UNION ALL SELECT 'o_orderstatus', 'common', round(b.o_orderstatus / b.n, 6),
               round(a.o_orderstatus / a.n, 6), round(a.o_orderstatus / a.n - b.o_orderstatus / b.n, 6) FROM b, a
        UNION ALL SELECT 'o_totalprice', 'common', round(b.o_totalprice / b.n, 6),
               round(a.o_totalprice / a.n, 6), round(a.o_totalprice / a.n - b.o_totalprice / b.n, 6) FROM b, a
    )
    """,
)
def schema_drift_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema + null-rate drift between two deterministic snapshots of the
    orders table (``quality.schema_drift``): the "before" snapshot is the
    fulfilled-orders slice WITHOUT o_orderpriority (simulating a producer
    that later added the column and dropped o_orderdate), the "after" is
    the current table without o_orderdate. Added/removed columns and every
    common column's null-rate delta are recomputed by DuckDB in closed
    form — one aggregate pass per snapshot, no per-column scans."""
    from .operators.quality import schema_drift

    orders = load_table(spark, sf_dir, "orders")
    before = orders.filter(F.col("o_orderstatus") == "F").drop("o_orderpriority")
    after = orders.drop("o_orderdate")
    return schema_drift(before, after)


@query(
    "winsorized_acctbal",
    oracle="""
    WITH cuts AS (
        SELECT quantile_cont(c_acctbal, 0.05) AS lo,
               quantile_cont(c_acctbal, 0.95) AS hi
        FROM customer
    )
    SELECT c_custkey,
           round(least(greatest(c_acctbal, lo), hi), 6) AS acctbal_w
    FROM customer, cuts
    """,
)
def winsorized_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization at the 5th/95th percentiles (``cleaning.winsorize``):
    tail influence capped while every row survives — the
    keep-the-observation counterpart of the IQR/MAD outlier FILTERS
    (P6/`mad_outliers`). Exact percentile_cont cut points (one aggregate
    pass for both, broadcast back), clip is pure projection; DuckDB
    restates the percentile definition and the clip verbatim."""
    from .operators.cleaning import winsorize

    cust = load_table(spark, sf_dir, "customer")
    out = winsorize(cust, ["c_acctbal"], lower=0.05, upper=0.95, round_to=6)
    return out.select("c_custkey", F.col("c_acctbal").alias("acctbal_w"))


@query(
    "event_gap_report",
    oracle="""
    WITH g AS (
        SELECT user_id,
               (epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts))) / 1000000.0 AS gap
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(gap) AS BIGINT) AS n_gaps,
           round(max(gap), 6) AS max_gap_s,
           round(avg(gap), 6) AS mean_gap_s,
           CAST(count(CASE WHEN gap > 86400 THEN 1 END) AS BIGINT) AS n_gaps_over
    FROM g GROUP BY user_id
    """,
)
def event_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-gap audit (``temporal.gap_report``, 1-day dropout
    bar): inter-event gap counts/max/mean and the number of
    over-threshold holes — the completeness gate a forecaster or
    resampler consults before trusting a series. One user-partitioned lag
    window + one groupBy; DuckDB recomputes every gap from the raw
    timestamps."""
    from .operators.temporal import gap_report

    ev = load_table(spark, sf_dir, "events")
    return gap_report(ev, "user_id", "ts", max_gap_seconds=86400)


@query(
    "nn_distance_profile",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    nn AS (
        SELECT q.vec_id,
               max(round(list_cosine_similarity(q.v, c.v), 6)) AS sim
        FROM e q JOIN e c ON q.vec_id < 200 AND q.vec_id <> c.vec_id
        GROUP BY q.vec_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_sampled,
           round(min(sim), 6) AS nn_sim_min,
           round(quantile_cont(sim, 0.25), 6) AS nn_sim_p25,
           round(quantile_cont(sim, 0.50), 6) AS nn_sim_p50,
           round(quantile_cont(sim, 0.75), 6) AS nn_sim_p75,
           round(quantile_cont(sim, 0.90), 6) AS nn_sim_p90,
           round(quantile_cont(sim, 0.99), 6) AS nn_sim_p99,
           round(max(sim), 6) AS nn_sim_max
    FROM nn
    """,
)
def nn_distance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup threshold calibration (``similarity.nn_distance_profile``):
    the exact nearest-neighbor similarity distribution for a 200-vector
    id-prefix sample — the background curve a dedup threshold must clear
    (a 0.9 bar is only meaningful if a random item's closest catalog
    neighbor sits well below 0.9). Sample side broadcast, one candidate
    scan, percentile fold on the sample-sized frame. DuckDB recomputes
    the exact NN similarities and all percentiles."""
    from .operators.similarity import nn_distance_profile as prof

    emb = load_table(spark, sf_dir, "embeddings")
    return prof(emb, "vec_id", "embedding", sample_ids=200)


@query(
    "event_volume_anomalies",
    oracle="""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS bucket_start,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, bucket_start, n_events,
               lag(n_events) OVER (PARTITION BY event_type ORDER BY bucket_start)
                   AS prev_events
        FROM daily
    ),
    resid AS (
        SELECT *, (n_events - prev_events)::DOUBLE AS residual
        FROM lagged WHERE prev_events IS NOT NULL
    ),
    stats AS (
        SELECT event_type, avg(residual) AS mu, stddev_samp(residual) AS sd
        FROM resid GROUP BY event_type
    )
    SELECT r.event_type, r.bucket_start, r.n_events, r.prev_events,
           round(r.residual, 6) AS residual,
           round((r.residual - s.mu) / s.sd, 6) AS resid_z
    FROM resid r JOIN stats s USING (event_type)
    WHERE s.sd IS NOT NULL AND s.sd > 0
      AND abs(r.residual - s.mu) > 2.0 * s.sd
    """,
)
def event_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily volume-anomaly flags per event type
    (``temporal.residual_anomalies``, z=2): day-over-day residuals
    z-scored against each type's own residual distribution — the
    pager-rule baseline monitoring starts from. Pre-aggregated to the
    (type, day) frame before any window; flagged output bounded by
    construction. DuckDB recomputes buckets, lags, residual moments and
    the z-cut."""
    from .operators.temporal import residual_anomalies

    ev = load_table(spark, sf_dir, "events")
    return residual_anomalies(ev, "event_type", "ts", bucket="day", z=2.0)
