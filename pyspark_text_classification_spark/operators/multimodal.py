"""Multimodal columns: opaque binary payloads with typed metadata.

Extension surface (north star, BASELINE.json:6): image/audio/video are
carried as ``binary`` columns plus a metadata struct; decode / resize /
frame-sample are Pandas-UDF stages over ``mapInPandas``. decode_media is
REAL for the public byte layouts expressible with numpy + the stdlib
(binary PPM, 24-bit BMP, PCM16 WAV, and non-interlaced 8-bit truecolor
PNG via stdlib zlib + scanline unfiltering — exercised end-to-end by
multimodal_decode_stats); lossy codecs (JPEG/MP3/H.264) need libraries
NOT in this environment and remain a documented NotImplementedError arm,
while everything Spark-side — schema, Arrow binary transfer, batch shape,
partition-local execution — is real and tested.

The synthetic corpus has no binary table, so the payload is derived from
documents.text (utf-8 encode): real bytes flowing through the real plumbing.

Scale notes: binary payloads ride the normal columnar path (parquet BYTE_ARRAY,
Arrow Binary); metadata-only queries NEVER touch payload bytes thanks to
parquet column pruning — the ``multimodal_meta`` plan reads just the
pruned columns. Feature extraction is partition-local mapInPandas (no
shuffle); at 100 TB the knobs are files.maxPartitionBytes (payloads are
big, keep row groups small) and per-worker codec reuse.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark_text_classification_spark.registry import query
from pyspark_text_classification_spark.sources.parquet import fan_out, load_table

ADLER_MOD = 65_521

FEATURE_SCHEMA = (
    "doc_id LONG, n_bytes LONG, first_byte INT, last_byte INT, byte_checksum LONG"
)


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """(doc_id, payload binary, meta struct<n_bytes, mime, n_chars>)."""
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )


def _decode_ppm(b: bytes) -> "np.ndarray":
    """Binary PPM (P6): ASCII header 'P6\\n{w} {h}\\n{maxval}\\n' then
    w*h*3 raw RGB bytes — the netpbm byte layout (public spec)."""
    if not b.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":  # comment line
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        fields.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    px = np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i)
    return px.reshape(h, w, 3)


def _decode_bmp(b: bytes) -> "np.ndarray":
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): little-endian header
    fields, bottom-up BGR rows padded to 4-byte multiples — decoded to
    a top-down HxWx3 RGB array (the public Windows DIB layout)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * abs(h), offset=off
    ).reshape(abs(h), stride)[:, : w * 3]
    img = rows.reshape(abs(h), w, 3)
    if h > 0:  # positive height = bottom-up storage
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR -> RGB


def _decode_wav(b: bytes) -> tuple[int, "np.ndarray"]:
    """16-bit PCM mono/stereo RIFF WAVE: walk the chunk list to 'fmt '
    and 'data' (the public RIFF layout); returns (sample_rate,
    int16 samples)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF WAVE payload")
    i, rate, bits, data = 12, None, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
        elif cid == b"data":
            data = b[i + 8 : i + 8 + size]
        i += 8 + size + (size & 1)
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError("only 16-bit PCM supported")
    return rate, np.frombuffer(data, dtype="<i2")


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(b: bytes) -> "np.ndarray":
    """Non-interlaced 8-bit truecolor PNG (color type 2 RGB / 6 RGBA):
    chunk walk -> IDAT inflate (stdlib zlib — DEFLATE is RFC 1951, no
    codec library needed) -> per-scanline unfilter of the five public
    filter types (None/Sub/Up/Average/Paeth, PNG spec §9).  Returns a
    top-down HxWxC uint8 array.  Scanlines are tiny in the fixture
    corpus, so the sequential filters (Sub/Average/Paeth carry an
    intra-row recurrence) run as plain loops inside the mapInPandas
    worker; Up/None stay vectorized."""
    import zlib

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i, w, h, ctype = 8, None, None, None
    idat = bytearray()
    while i + 8 <= len(b):
        size = int.from_bytes(b[i : i + 4], "big")
        typ = b[i + 4 : i + 8]
        # bounds-check the declared length against the remaining buffer:
        # a malformed length would otherwise silently truncate the data
        # slice (or skip past IEND) and surface later as an opaque
        # zlib/frombuffer error instead of a parse error (ADVICE r8)
        if i + 12 + size > len(b):
            raise ValueError(
                f"truncated chunk: {typ!r} declares {size} bytes with "
                f"{len(b) - i - 12} available"
            )
        data = b[i + 8 : i + 8 + size]
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, ctype = data[8], data[9]
            comp, filt, interlace = data[10], data[11], data[12]
            if depth != 8 or ctype not in (2, 6) or comp or filt or interlace:
                raise ValueError(
                    "only non-interlaced 8-bit RGB/RGBA PNG supported"
                )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        i += 12 + size  # length + type + data + crc
    if w is None:
        raise ValueError("missing IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    ch = 3 if ctype == 2 else 4
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for r in range(h):
        f = raw[pos]
        line = np.frombuffer(raw, np.uint8, stride, pos + 1)
        pos += 1 + stride
        prev = out[r - 1] if r else np.zeros(stride, np.uint8)
        if f == 0:  # None
            recon = line.copy()
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            recon = (
                np.cumsum(line.reshape(w, ch).astype(np.int64), axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: uint8 addition wraps mod 256
            recon = line + prev
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            for j in range(stride):
                left = rec[j - ch] if j >= ch else 0
                rec[j] = (int(line[j]) + ((left + int(prev[j])) >> 1)) & 0xFF
            recon = rec.astype(np.uint8)
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            for j in range(stride):
                a = rec[j - ch] if j >= ch else 0
                up = int(prev[j])
                c = int(prev[j - ch]) if j >= ch else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = up
                else:
                    pred = c
                rec[j] = (int(line[j]) + pred) & 0xFF
            recon = rec.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[r] = recon
    return out.reshape(h, w, ch)


def decode_media(payload_bytes: bytes, mime: str) -> object:
    """Decode an image/audio payload to a numpy array.

    REAL for the public byte layouts expressible with numpy + the
    stdlib: binary PPM (P6), 24-bit BMP and non-interlaced 8-bit
    truecolor PNG (zlib inflate + scanline unfilter) return an HxWxC
    uint8 array; 16-bit PCM WAV returns (sample_rate, int16 samples).
    Lossy compressed formats (JPEG/MP3/H.264 ...) still require codec
    libraries absent from this build — plug PIL / torchaudio / av into
    the dispatch below; the surrounding mapInPandas plumbing (schema,
    Arrow binary batches, stats) is complete and exercised end-to-end
    by multimodal_decode_stats."""
    b = bytes(payload_bytes)
    if mime == "image/x-portable-pixmap":
        return _decode_ppm(b)
    if mime == "image/bmp":
        return _decode_bmp(b)
    if mime == "image/png":
        return _decode_png(b)
    if mime == "audio/wav":
        return _decode_wav(b)
    raise NotImplementedError(
        f"decode for {mime!r} requires codec libraries not present in "
        "this build; plug PIL/torchaudio/av into decode_media() — the "
        "stdlib-expressible formats (PPM/BMP/PNG/WAV-PCM) decode natively"
    )


def extract_byte_features(payloads: DataFrame) -> DataFrame:
    """Deterministic per-payload byte features via mapInPandas: size,
    first/last byte, Adler-style checksum (sum of bytes mod 65521).

    This is the exact execution shape a real decode+featurize stage uses —
    binary Arrow batches in, fixed-schema frame out, partition-local.
    """
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                rows.append(
                    (
                        doc_id,
                        int(b.size),
                        int(b[0]) if b.size else -1,
                        int(b[-1]) if b.size else -1,
                        int(b.sum(dtype=np.int64)) % ADLER_MOD,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "first_byte", "last_byte", "byte_checksum",
                ],
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        feats, schema=FEATURE_SCHEMA
    )


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           'text/plain' AS mime,
           n_chars
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata projection over the binary table — payload bytes are never
    read (column pruning): the query pattern for corpus inventory at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    bin_df = attach_binary_payload(docs)
    return bin_df.select(
        "doc_id",
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_chars").alias("n_chars"),
    )


@query(
    "multimodal_byte_features",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN length(text) > 0 THEN unicode(substr(text, 1, 1))
                     ELSE -1 END AS INTEGER) AS first_byte,
           CAST(CASE WHEN length(text) > 0
                     THEN unicode(substr(text, length(text), 1))
                     ELSE -1 END AS INTEGER) AS last_byte,
           CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(text, ''),
                               c -> CAST(unicode(c) AS BIGINT))))
                % {ADLER_MOD} AS BIGINT) AS byte_checksum
    FROM documents
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF feature extraction over binary payloads, value-verified:
    the SQL twin recomputes size/first/last/checksum from the text the
    payload encodes (ASCII corpus => byte == codepoint), proving the Arrow
    binary round-trip bit-exact."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return extract_byte_features(attach_binary_payload(docs))


FRAME_BYTES = 256     # pseudo-video frame size
SAMPLE_EVERY = 4      # keep every 4th frame
RESIZE_STRIDE = 7     # pseudo-resize: keep every 7th byte

FRAME_SCHEMA = "doc_id LONG, frame_idx INT, frame_len INT, frame_checksum LONG"
RESIZE_SCHEMA = "doc_id LONG, n_bytes_out LONG, resized_checksum LONG"


def _frame_checksums(arr: "np.ndarray") -> "np.ndarray":
    """Per-frame byte checksums (sum mod ADLER_MOD) of a uint8 buffer
    split into FRAME_BYTES frames — zero-padded reshape + axis sum, so
    the whole decode stand-in is one vectorized numpy pass (zero pad
    bytes don't change sums; the real codec swaps this via
    decode_media())."""
    n_frames = -(-arr.size // FRAME_BYTES)
    if n_frames == 0:
        return np.empty(0, dtype=np.int64)
    padded = np.zeros(n_frames * FRAME_BYTES, dtype=np.int64)
    padded[: arr.size] = arr
    return padded.reshape(n_frames, FRAME_BYTES).sum(axis=1) % ADLER_MOD


def sample_frames(payloads: DataFrame) -> DataFrame:
    """Frame-sampling stage: treat each payload as a stream of
    FRAME_BYTES-sized frames and keep every SAMPLE_EVERY-th one — the
    execution shape of video keyframe extraction (1:N row fan-out through
    mapInPandas, schema-changing, partition-local, no shuffle). A real
    decoder drops into the slice loop via decode_media(); the byte
    arithmetic here keeps the whole stage oracle-checkable."""
    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                cs = _frame_checksums(arr)
                if not cs.size:
                    continue
                keep = np.arange(0, cs.size, SAMPLE_EVERY)
                fl = np.full(cs.size, FRAME_BYTES, dtype=np.int32)
                fl[-1] = arr.size - (cs.size - 1) * FRAME_BYTES
                ids.append(np.full(keep.size, doc_id, dtype=np.int64))
                idxs.append(keep.astype(np.int32))
                lens.append(fl[keep])
                sums.append(cs[keep])
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids) if ids else
                    np.empty(0, dtype=np.int64),
                    "frame_idx": np.concatenate(idxs) if ids else
                    np.empty(0, dtype=np.int32),
                    "frame_len": np.concatenate(lens) if ids else
                    np.empty(0, dtype=np.int32),
                    "frame_checksum": np.concatenate(sums) if ids else
                    np.empty(0, dtype=np.int64),
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        frames, schema=FRAME_SCHEMA
    )


def resize_payloads(payloads: DataFrame) -> DataFrame:
    """Resize stage: deterministic downsample keeping every
    RESIZE_STRIDE-th byte — the execution shape of image resizing
    (payload in, smaller payload summary out, 1:1, partition-local)."""
    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                small = np.frombuffer(bytes(buf), dtype=np.uint8)[
                    ::RESIZE_STRIDE
                ]
                rows.append(
                    (
                        doc_id,
                        int(small.size),
                        int(small.sum(dtype=np.int64)) % ADLER_MOD,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes_out", "resized_checksum"]
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        resize, schema=RESIZE_SCHEMA
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(idx AS INTEGER) AS frame_idx,
           CAST(length(fr) AS INTEGER) AS frame_len,
           CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
                list_transform(string_split(fr, ''),
                               c -> CAST(unicode(c) AS BIGINT))))
                % {ADLER_MOD} AS BIGINT) AS frame_checksum
    FROM (
      SELECT doc_id, idx,
             substr(text, idx * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS fr
      FROM (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0)
                 AS BIGINT), {SAMPLE_EVERY})) AS idx
        FROM documents WHERE length(text) > 0
      )
    )
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe-style sampling over binary payloads, value-verified: the
    SQL twin recomputes each sampled frame's length and checksum from the
    text the payload encodes (ASCII corpus => byte == codepoint)."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return sample_frames(
        attach_binary_payload(docs.filter(F.length("text") > 0))
    )


@query(
    "multimodal_resize",
    oracle=f"""
    SELECT doc_id,
           CAST(length(small) AS BIGINT) AS n_bytes_out,
           CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
                list_transform(small, c -> CAST(unicode(c) AS BIGINT))))
                % {ADLER_MOD} AS BIGINT) AS resized_checksum
    FROM (
      SELECT doc_id,
             list_filter(string_split(text, ''),
                         (c, i) -> (i - 1) % {RESIZE_STRIDE} = 0) AS small
      FROM documents
    )
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-downsample ('resize') over binary payloads via mapInPandas,
    value-verified against byte arithmetic recomputed in SQL."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return resize_payloads(attach_binary_payload(docs))


@query(
    "multimodal_dedup_exact",
    oracle="""
    SELECT min(doc_id) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_copies,
           CAST(min(octet_length(encode(text))) AS BIGINT) AS n_bytes
    FROM documents
    GROUP BY sha256(text)
    """,
)
def multimodal_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary dedup: group payloads by content digest, keep the
    canonical (min doc_id) copy — the first pass every petabyte-scale
    image/audio corpus runs, since crawlers re-fetch identical bytes
    under many URLs.

    The SHA-256 digest is computed map-side next to the scan (JVM
    expression), so the shuffle carries (digest, doc_id, n_bytes) — never
    the payload bytes themselves: at 100 TB the exchange is ~50 bytes/row
    regardless of payload size. Same keeper policy (min id) as the text
    dedup family."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(fan_out(docs))
    return (
        payloads.groupBy(F.sha2("payload", 256).alias("digest"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").alias("n_copies"),
            F.min(F.col("meta.n_bytes")).cast("long").alias("n_bytes"),
        )
        .drop("digest")
    )


# ---------------------------------------------------------------------------
# Binary -> embedding -> similarity: the multimodal retrieval path
# ---------------------------------------------------------------------------

EMBED_DIM = 16  # nibble histogram: 4-bit value frequencies of the payload
EMBED_SAMPLE_MOD = 25  # every 25th doc is a retrieval query
EMBED_TOP_K = 3
_HEX_CHARS = "0123456789ABCDEF"


def _nibble_count_sql(i: int) -> str:
    # count of nibble i = chars removed when deleting that hex digit
    c = _HEX_CHARS[i]
    return (
        f"CAST(length(hx) - length(replace(hx, '{c}', '')) AS DOUBLE)"
    )


def embed_payload_nibbles(payloads: DataFrame) -> DataFrame:
    """(doc_id, vec array<double>): per-payload nibble histogram via a
    numpy mapInPandas stage — the stand-in for a real media encoder with
    the identical Arrow-binary-in / fixed-vector-out contract (swap the
    bincount for a model forward pass and nothing else changes)."""
    import numpy as np

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(buf), dtype=np.uint8)
                nib = np.concatenate([b >> 4, b & 15]) if b.size else b
                counts = np.bincount(nib, minlength=EMBED_DIM)[:EMBED_DIM]
                out.append((int(doc_id), [float(x) for x in counts]))
            yield pd.DataFrame(out, columns=["doc_id", "vec"])

    return payloads.select("doc_id", "payload").mapInPandas(
        embed, schema="doc_id LONG, vec ARRAY<DOUBLE>"
    )


@query(
    "multimodal_embed_topk",
    oracle=f"""
    WITH hx AS (
      SELECT doc_id, hex(encode(text)) AS hx FROM documents
      WHERE length(text) > 0
    ),
    v AS (
      SELECT doc_id,
             [{', '.join(_nibble_count_sql(i) for i in range(EMBED_DIM))}]
               AS vec
      FROM hx
    ),
    n AS (
      SELECT doc_id, vec,
             sqrt(list_reduce(list_prepend(0.0,
               list_transform(vec, x -> x * x)), (a, x) -> a + x)) AS nrm
      FROM v
    ),
    p AS (
      SELECT a.doc_id, b.doc_id AS neighbor_id,
             list_reduce(list_prepend(0.0, list_transform(
               range(1, {EMBED_DIM} + 1), i -> a.vec[i] * b.vec[i])),
               (acc, x) -> acc + x) / (a.nrm * b.nrm) AS cos
      FROM n a JOIN n b
        ON a.doc_id % {EMBED_SAMPLE_MOD} = 0 AND a.doc_id <> b.doc_id
    )
    SELECT doc_id, neighbor_id,
           floor(cos * 10000.0 + 0.5) / 10000.0 AS cos_sim,
           CAST(rnk AS INT) AS rank
    FROM (
      SELECT doc_id, neighbor_id, cos,
             row_number() OVER (
               PARTITION BY doc_id
               ORDER BY floor(cos * 10000.0 + 0.5) / 10000.0 DESC, neighbor_id
             ) AS rnk
      FROM p
    ) WHERE rnk <= {EMBED_TOP_K}
    """,
)
def multimodal_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal retrieval path end to end: binary payloads ->
    Arrow-batched numpy embedding (nibble histogram standing in for a
    media encoder) -> exact cosine top-k for a deterministic query
    sample — proving binary columns flow into the similarity machinery
    with a full value-level oracle (DuckDB recomputes the histogram from
    hex(payload)).

    Scale shape: the embedding stage is partition-local mapInPandas (no
    shuffle, model-swappable); retrieval restricts the fold to
    |sample| x n pairs with the query side broadcast — the ANN operators
    in operators/similarity.py take over when the sample IS the corpus."""
    docs = fan_out(load_table(spark, sf_dir, "documents")).filter(
        F.length("text") > 0
    )
    e = embed_payload_nibbles(attach_binary_payload(docs))
    nrm = F.sqrt(
        F.aggregate(
            F.transform("vec", lambda x: x * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    n = e.select("doc_id", "vec", nrm.alias("nrm"))
    a = n.filter(F.pmod(F.col("doc_id"), F.lit(EMBED_SAMPLE_MOD)) == 0).select(
        F.col("doc_id"), F.col("vec").alias("av"), F.col("nrm").alias("an")
    )
    b = n.select(
        F.col("doc_id").alias("neighbor_id"),
        F.col("vec").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("av"), F.col("bv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        F.broadcast(a)
        .crossJoin(b)
        .filter(F.col("doc_id") != F.col("neighbor_id"))
        .select(
            "doc_id",
            "neighbor_id",
            (dot / (F.col("an") * F.col("bn"))).alias("cos"),
        )
    )
    cos4 = F.floor(F.col("cos") * 10000.0 + F.lit(0.5)) / 10000.0
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(cos4.desc(), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= EMBED_TOP_K)
        .select(
            "doc_id",
            "neighbor_id",
            cos4.alias("cos_sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --- perceptual-hash near-duplicate detection --------------------------------
PHASH_BLOCKS = 64   # aHash grid: 64 positional blocks -> 64 hash bits
PHASH_BANDS = 8     # 8 bands x 8 bits: LOSSLESS for hamming <= 7 (pigeonhole)
PHASH_HAM_MAX = 4   # near-dup threshold (bits)

PHASH_SCHEMA = "doc_id LONG, lo LONG, hi LONG"

# DuckDB twin of the block-sum hash: per block b, the codepoint sum of
# text[(b*n) div 64, ((b+1)*n) div 64) (1-based substr), bit set iff the
# block sum strictly exceeds the mean block sum (sum*64 > total).  ASCII
# corpus => codepoint == byte, the same equivalence byte_checksum uses.
_SQL_PHASH = f"""
    SELECT d.doc_id, t.blk,
           COALESCE(list_sum(list_transform(
             list_filter(string_split(substr(d.text,
               CAST((t.blk * length(d.text)) // {PHASH_BLOCKS} + 1 AS INT),
               CAST(((t.blk + 1) * length(d.text)) // {PHASH_BLOCKS}
                    - (t.blk * length(d.text)) // {PHASH_BLOCKS} AS INT)),
               ''), c -> c <> ''),
             c -> CAST(unicode(c) AS BIGINT))), 0) AS s
    FROM documents d, (SELECT CAST(range AS BIGINT) AS blk
                       FROM range({PHASH_BLOCKS})) t
"""

_SQL_PHASH_BITS = f"""
    WITH blocks AS ({_SQL_PHASH}),
    tot AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS st
            FROM blocks GROUP BY 1),
    bits AS (
      SELECT b.doc_id,
             CAST(sum(CASE WHEN b.blk < 32 AND b.s * {PHASH_BLOCKS} > t.st
                  THEN (CAST(1 AS BIGINT) << b.blk) ELSE 0 END)
                  AS BIGINT) AS lo,
             CAST(sum(CASE WHEN b.blk >= 32 AND b.s * {PHASH_BLOCKS} > t.st
                  THEN (CAST(1 AS BIGINT) << (b.blk - 32)) ELSE 0 END)
                  AS BIGINT) AS hi
      FROM blocks b JOIN tot t USING (doc_id) GROUP BY 1
    )
"""


def compute_phash(payloads: DataFrame) -> DataFrame:
    """64-bit positional block hash of each binary payload via
    mapInPandas — the average-hash (aHash) construction: split the
    payload into {PHASH_BLOCKS} equal byte ranges (the "8x8 resize"),
    threshold each block's byte sum at the payload mean.  Emitted as two
    positive 32-bit halves (lo = bits 0-31, hi = bits 32-63) so no
    sign-bit arithmetic ever happens.  A real image pHash drops its DCT
    coefficients into the same threshold loop via decode_media()."""

    # block sums via prefix-sum differences at the block boundaries —
    # exact for empty blocks (boundary indices repeat -> difference 0),
    # one vectorized pass per payload instead of 64 Python slice-sums
    bounds_frac = np.arange(PHASH_BLOCKS + 1, dtype=np.int64)
    weights_lo = 1 << np.arange(32, dtype=np.int64)

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                n = arr.size
                prefix = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(arr, dtype=np.int64, out=prefix[1:])
                cuts = (bounds_frac * n) // PHASH_BLOCKS
                s = prefix[cuts[1:]] - prefix[cuts[:-1]]
                bits = s * PHASH_BLOCKS > prefix[n]
                lo = int((bits[:32] * weights_lo).sum())
                hi = int((bits[32:] * weights_lo).sum())
                rows.append((doc_id, lo, hi))
            yield pd.DataFrame(rows, columns=["doc_id", "lo", "hi"])

    return payloads.select("doc_id", "payload").mapInPandas(
        hashes, schema=PHASH_SCHEMA
    )


@query(
    "multimodal_phash_near_dup",
    oracle=f"""
    {_SQL_PHASH_BITS}
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.lo, b.lo))
                + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS hamming
    FROM bits a JOIN bits b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
          <= {PHASH_HAM_MAX}
    """,
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over binary payloads:
    aHash-style 64-bit block hashes (compute_phash), Hamming-LSH banding
    ({PHASH_BANDS} bands x 8 bits) for candidates, exact popcount verify
    at hamming <= {PHASH_HAM_MAX}.

    The banding is EXACT here, not approximate: a pair within hamming h
    differs in at most h bands, so with h <= {PHASH_BANDS}-1 at least one
    band matches (pigeonhole) — the engine provably equals the oracle's
    O(n^2) brute force while doing bounded equi-joins.  At 100 TB the
    hash pass is partition-local mapInPandas (shuffle carries 24 B/doc),
    candidates are one band equi-join, and the verify join touches only
    candidate pairs — the same candidate-restriction discipline as
    dedup_minhash_lsh."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    hashes = compute_phash(attach_binary_payload(docs)).localCheckpoint(
        eager=True
    )
    # explode the 8 bands JVM-side: band j of lo for j=0..3, of hi for 4..7
    band_cols = []
    for j in range(PHASH_BANDS):
        half = "lo" if j < 4 else "hi"
        shift = 8 * (j % 4)
        band_cols.append(
            F.struct(
                F.lit(j).alias("band"),
                F.expr(f"shiftright({half}, {shift}) & 255").alias("val"),
            )
        )
    bands = hashes.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    cand = (
        bands.alias("x")
        .join(
            bands.select(
                F.col("doc_id").alias("doc_b"), "band", "val"
            ).alias("y"),
            ["band", "val"],
        )
        .filter(F.col("doc_id") < F.col("doc_b"))
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    ha = hashes.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lo").alias("lo_a"),
        F.col("hi").alias("hi_a"),
    )
    hb = hashes.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lo").alias("lo_b"),
        F.col("hi").alias("hi_b"),
    )
    ham = F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    ) + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .withColumn("hamming", ham.cast("long"))
        .filter(F.col("hamming") <= PHASH_HAM_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


# Shot-boundary threshold on the |checksum delta| between CONSECUTIVE
# frames (selects the ~top-decile jumps on the synthetic corpus; a real
# detector thresholds a frame-difference metric the same way).
SHOT_DELTA_MIN = 20_000
SHOT_SCHEMA = "doc_id LONG, frame_idx INT, frame_checksum LONG"


def frame_features(payloads: DataFrame) -> DataFrame:
    """Per-frame feature stage: EVERY consecutive frame's checksum (no
    sampling — boundary detection needs adjacent frames).  Same 1:N
    partition-local mapInPandas shape as sample_frames; a real decoder
    swaps the byte checksum for a visual feature via decode_media()."""
    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
                cs = _frame_checksums(
                    np.frombuffer(bytes(buf), dtype=np.uint8)
                )
                if not cs.size:
                    continue
                ids.append(np.full(cs.size, doc_id, dtype=np.int64))
                idxs.append(np.arange(cs.size, dtype=np.int32))
                sums.append(cs)
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids) if ids else
                    np.empty(0, dtype=np.int64),
                    "frame_idx": np.concatenate(idxs) if ids else
                    np.empty(0, dtype=np.int32),
                    "frame_checksum": np.concatenate(sums) if ids else
                    np.empty(0, dtype=np.int64),
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        frames, schema=SHOT_SCHEMA
    )


@query(
    "multimodal_shot_boundaries",
    oracle=f"""
    WITH fr AS (
      SELECT doc_id, CAST(idx AS INTEGER) AS frame_idx,
             CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(
                    substr(text, idx * {FRAME_BYTES} + 1, {FRAME_BYTES}), ''),
                    c -> CAST(unicode(c) AS BIGINT))))
                  % {ADLER_MOD} AS BIGINT) AS cs
      FROM (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0)
                 AS BIGINT))) AS idx
        FROM documents WHERE length(text) > 0
      )
    ),
    d AS (
      SELECT doc_id, frame_idx, cs,
             lag(cs) OVER (PARTITION BY doc_id ORDER BY frame_idx)
               AS prev_cs
      FROM fr
    )
    SELECT doc_id, frame_idx,
           prev_cs AS prev_checksum, cs AS frame_checksum,
           CAST(abs(cs - prev_cs) AS BIGINT) AS delta
    FROM d
    WHERE prev_cs IS NOT NULL AND abs(cs - prev_cs) >= {SHOT_DELTA_MIN}
    """,
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over pseudo-video payloads: a Python
    decode stage emits one feature per consecutive frame (mapInPandas,
    partition-local), then the boundary analysis — lag over the per-asset
    frame sequence, flag jumps >= {SHOT_DELTA_MIN} — runs JVM-side.  The
    realistic split for 100 TB video pipelines: only the codec work needs
    Python; the temporal analytics stay relational (one shuffle on the
    asset id), so boundary logic composes with everything else
    (sessionize-like windows, joins against transcripts) at no extra
    Arrow crossings."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    fr = frame_features(
        attach_binary_payload(docs.filter(F.length("text") > 0))
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    d = fr.select(
        "doc_id",
        "frame_idx",
        F.lag("frame_checksum").over(w).alias("prev_checksum"),
        "frame_checksum",
    ).withColumn(
        "delta",
        F.abs(F.col("frame_checksum") - F.col("prev_checksum")),
    )
    return d.filter(
        F.col("prev_checksum").isNotNull()
        & (F.col("delta") >= SHOT_DELTA_MIN)
    )


# ---------------------------------------------------------------------------
# Container sniffing + VAD segmentation — the two remaining ingest-side
# multimodal primitives: identify what a blob IS before routing it to a
# decoder, and segment a stream-like payload by activity.
# ---------------------------------------------------------------------------

# Synthetic container headers attached by doc_id % 4 so the corpus carries
# all three magic signatures plus raw blobs (the testdata payloads are
# text bytes; a real lake's blobs arrive with real headers — everything
# downstream of construction is honest byte-prefix detection).
_MAGIC = {0: "FFD8FFE0", 1: "89504E47", 2: "52494646", 3: ""}  # jpg/png/RIFF
_MIME = {
    "FFD8FF": "image/jpeg",
    "89504E": "image/png",
    "524946": "audio/wav",
}


def attach_container_headers(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): text bytes prefixed with a deterministic magic
    signature per doc_id % 4 (one class stays headerless)."""
    header = None
    for k, hx in _MAGIC.items():
        h = F.unhex(F.lit(hx)) if hx else F.lit(b"")
        header = (
            F.when(F.pmod("doc_id", F.lit(4)) == k, h)
            if header is None
            else header.when(F.pmod("doc_id", F.lit(4)) == k, h)
        )
    return docs.select(
        "doc_id",
        F.concat(header, F.encode("text", "UTF-8")).alias("payload"),
    )


@query(
    "multimodal_codec_detect",
    oracle=f"""
    WITH hx AS (
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               {' '.join(f"WHEN {k} THEN '{v}'" for k, v in _MAGIC.items())}
             END || hex(encode(text)) AS h
      FROM documents
    ),
    det AS (
      SELECT doc_id, length(h) // 2 AS n_bytes,
             CASE
               {' '.join(
                   f"WHEN substr(h, 1, 6) = '{sig}' THEN '{mime}'"
                   for sig, mime in _MIME.items())}
               ELSE 'application/octet-stream'
             END AS mime
      FROM hx
    )
    SELECT mime, CAST(count(*) AS BIGINT) AS n_assets,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes
    FROM det GROUP BY 1
    """,
)
def multimodal_codec_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container sniffing over binary payloads: detect each asset's
    format from its magic bytes (JPEG FF D8 FF, PNG 89 50 4E 47, RIFF/
    WAV 52 49 46 46; anything else is opaque) and report the per-mime
    asset count and byte volume — the ingest router every multimodal
    lake runs before dispatching blobs to format-specific decoders.

    Detection is pure JVM relational work on the binary column (one
    substring + CASE over the hex prefix — no Python, no codec): at
    100 TB the sniff costs a 4-byte read per blob inside the scan
    stage, and the mime aggregate is map-side-combined.  The synthetic
    headers are attached deterministically (doc_id % 4) since testdata
    payloads are raw text; swap attach_container_headers for real
    ingest bytes and nothing downstream changes."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    p = attach_container_headers(docs)
    prefix = F.hex(F.expr("substring(payload, 1, 3)"))
    mime = None
    for sig, m in _MIME.items():
        cond = prefix == sig
        mime = F.when(cond, m) if mime is None else mime.when(cond, m)
    mime = mime.otherwise("application/octet-stream")
    det = p.select(
        mime.alias("mime"), F.octet_length("payload").alias("n_bytes")
    )
    return det.groupBy("mime").agg(
        F.count("*").cast("long").alias("n_assets"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
    )


# Voiced-frame threshold on the frame energy stand-in (the byte checksum):
# full 256-byte ASCII frames land ~18-24k, so 20k splits the corpus into
# real alternating voiced/unvoiced runs rather than one giant island.
VAD_ENERGY_MIN = 20_000


@query(
    "multimodal_audio_energy_vad",
    oracle=f"""
    WITH fr AS (
      SELECT doc_id, CAST(idx AS INTEGER) AS frame_idx,
             CAST(list_sum(list_prepend(CAST(0 AS BIGINT),
                  list_transform(string_split(
                    substr(text, idx * {FRAME_BYTES} + 1, {FRAME_BYTES}), ''),
                    c -> CAST(unicode(c) AS BIGINT))))
                  % {ADLER_MOD} AS BIGINT) AS energy
      FROM (
        SELECT doc_id, text,
               unnest(range(0, CAST(ceil(length(text) / {FRAME_BYTES}.0)
                 AS BIGINT))) AS idx
        FROM documents WHERE length(text) > 0
      )
    ),
    v AS (
      SELECT doc_id, frame_idx, energy,
             frame_idx - row_number() OVER (
               PARTITION BY doc_id ORDER BY frame_idx) AS island
      FROM fr WHERE energy >= {VAD_ENERGY_MIN}
    )
    SELECT doc_id,
           CAST(min(frame_idx) AS INTEGER) AS seg_start,
           CAST(max(frame_idx) AS INTEGER) AS seg_end,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(energy) AS BIGINT) AS energy_sum
    FROM v GROUP BY doc_id, island
    """,
)
def multimodal_audio_energy_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segmentation over pseudo-audio payloads: the
    Python decode stage emits per-frame energies (frame_features — a
    real decoder swaps in RMS energy via decode_media()), then the
    segmentation is pure JVM gaps-and-islands: voiced frames (energy >=
    {VAD_ENERGY_MIN}) grouped into maximal consecutive runs by the
    frame_idx - row_number() island key, one segment row per run with
    its span and energy mass.

    The same codec boundary as shot_boundaries: Python only where the
    codec lives, the temporal logic relational (one shuffle on the
    asset id), so VAD output composes directly with transcript joins
    and windowed analytics at 100 TB."""
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    fr = frame_features(
        attach_binary_payload(docs.filter(F.length("text") > 0))
    ).select(
        "doc_id", "frame_idx", F.col("frame_checksum").alias("energy")
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    v = fr.filter(F.col("energy") >= VAD_ENERGY_MIN).select(
        "doc_id",
        "frame_idx",
        "energy",
        (F.col("frame_idx") - F.row_number().over(w)).alias("island"),
    )
    return v.groupBy("doc_id", "island").agg(
        F.min("frame_idx").cast("int").alias("seg_start"),
        F.max("frame_idx").cast("int").alias("seg_end"),
        F.count("*").cast("long").alias("n_frames"),
        F.sum("energy").cast("long").alias("energy_sum"),
    ).drop("island")


# --------------------------------------------------------------------------
# Real decode: deterministic uncompressed payloads (PPM/BMP/WAV — public
# byte layouts, pure numpy) flowing through decode_media, with a DuckDB
# twin that recomputes the same stats from the generative formulas.
# --------------------------------------------------------------------------
DECODE_SCHEMA = (
    "doc_id LONG, mime STRING, width LONG, height LONG, "
    "sample_rate LONG, n_units LONG, sig_sum LONG, first_val LONG"
)
# Generative formulas (all non-negative, mirrored verbatim in the oracle):
#   doc_id % 4 = 0 -> P6 PPM,   w = 4 + doc_id % 5, h = 3,
#                     byte(i) = (doc_id*31 + i*7) % 256   (row-major RGB)
#   doc_id % 4 = 1 -> 24b BMP,  w = 3 + doc_id % 4, h = 2,
#                     byte(i) = (doc_id*17 + i*11) % 256  (logical top-down
#                     RGB; the FILE stores bottom-up BGR + row padding,
#                     which the decoder must undo — that asymmetry is what
#                     proves the decode is real, not an echo)
#   doc_id % 4 = 2 -> PCM16 WAV, rate = 8000 + 250*(doc_id % 7),
#                     n = 16 + doc_id % 17,
#                     s(i) = ((doc_id*13 + i*5) % 65536) - 32768
#   doc_id % 4 = 3 -> 8-bit RGBA PNG, w = 2 + doc_id % 3, h = 5,
#                     byte(i) = (doc_id*23 + i*13) % 256  (logical top-down
#                     row-major RGBA; the FILE stores zlib-DEFLATEd
#                     scanlines, row r filtered with type (doc_id+r) % 5 —
#                     every one of the five public filters appears in
#                     every payload, so a broken Sub/Up/Average/Paeth
#                     inverse or inflate path hash-mismatches)


def _encode_bmp(img: "np.ndarray") -> bytes:
    """Encode a top-down HxWx3 RGB array as an uncompressed 24-bit BMP
    (bottom-up BGR rows padded to 4 bytes — the public DIB layout)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR
    data = rows.tobytes()
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    head = (
        b"BM"
        + (14 + 40 + len(data)).to_bytes(4, "little")
        + (0).to_bytes(4, "little")
        + (54).to_bytes(4, "little")
    )
    return head + info + data


def _encode_png(img: "np.ndarray", row_filters: list[int]) -> bytes:
    """Encode a top-down HxWxC (C = 3 or 4) uint8 array as a
    non-interlaced 8-bit PNG, filtering scanline r with
    row_filters[r] — the write half of the PNG round-trip, used by the
    fixture generator to exercise ALL FIVE public filter types against
    the decoder (per the spec, a filter predicts from the RAW bytes of
    the prior pixels, so encode subtracts what decode adds back)."""
    import zlib

    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for r in range(h):
        f = row_filters[r]
        cur = flat[r]
        prev = flat[r - 1] if r else np.zeros(stride, dtype=np.int32)
        left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, dtype=np.int32), prev[:-ch]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = (cur - left) % 256
        elif f == 2:
            filt = (cur - prev) % 256
        elif f == 3:
            filt = (cur - ((left + prev) >> 1)) % 256
        elif f == 4:
            p = left + prev - upleft
            pa, pb, pc = (
                np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = (cur - pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        raw.append(f)
        raw += filt.astype(np.uint8).tobytes()

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2 if ch == 3 else 6, 0, 0, 0])
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _encode_wav(rate: int, samples: "np.ndarray") -> bytes:
    """Encode int16 mono samples as a PCM RIFF WAVE (public layout)."""
    data = samples.astype("<i2").tobytes()
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")
        + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunk = b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(fmt) + len(chunk)).to_bytes(4, "little") + b"WAVE" + fmt + chunk


def synth_media(docs: DataFrame) -> DataFrame:
    """(doc_id, mime, payload binary): deterministic uncompressed media
    payloads (the generative formulas above) via mapInPandas — real
    header-carrying bytes in Arrow binary batches, the write half of
    the decode round-trip."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                m = d % 4
                if m == 0:
                    w, h = 4 + d % 5, 3
                    px = (
                        (d * 31 + np.arange(w * h * 3, dtype=np.int64) * 7)
                        % 256
                    ).astype(np.uint8)
                    payload = b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()
                    mime = "image/x-portable-pixmap"
                elif m == 1:
                    w, h = 3 + d % 4, 2
                    px = (
                        (d * 17 + np.arange(w * h * 3, dtype=np.int64) * 11)
                        % 256
                    ).astype(np.uint8)
                    payload = _encode_bmp(px.reshape(h, w, 3))
                    mime = "image/bmp"
                elif m == 2:
                    rate = 8000 + 250 * (d % 7)
                    n = 16 + d % 17
                    s = (
                        (d * 13 + np.arange(n, dtype=np.int64) * 5) % 65536
                    ) - 32768
                    payload = _encode_wav(rate, s.astype(np.int16))
                    mime = "audio/wav"
                else:
                    w, h = 2 + d % 3, 5
                    px = (
                        (d * 23 + np.arange(w * h * 4, dtype=np.int64) * 13)
                        % 256
                    ).astype(np.uint8)
                    payload = _encode_png(
                        px.reshape(h, w, 4), [(d + r) % 5 for r in range(h)]
                    )
                    mime = "image/png"
                rows.append((doc_id, mime, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "mime", "payload"])

    return docs.select("doc_id").mapInPandas(
        gen, schema="doc_id LONG, mime STRING, payload BINARY"
    )


def decode_stats(bin_df: DataFrame) -> DataFrame:
    """Per-payload stats computed FROM THE DECODED ARRAYS (every value
    flows through decode_media's header parse + numpy decode): images
    report (width, height, n_pixels, sum of RGB bytes, first pixel as
    R*65536+G*256+B); audio reports (sample_rate, n_samples, sum of
    squared samples, first sample).  Exact integers throughout — no
    float to diverge cross-engine."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, mime, buf in zip(
                pdf["doc_id"], pdf["mime"], pdf["payload"]
            ):
                if mime == "audio/wav":
                    rate, s = decode_media(buf, mime)
                    s64 = s.astype(np.int64)
                    rows.append(
                        (
                            doc_id, mime, -1, -1, rate, int(s.size),
                            int((s64 * s64).sum()), int(s[0]),
                        )
                    )
                else:
                    img = decode_media(buf, mime)
                    h, w, _ = img.shape
                    rows.append(
                        (
                            doc_id, mime, w, h, -1, w * h,
                            int(img.sum(dtype=np.int64)),
                            int(img[0, 0, 0]) * 65536
                            + int(img[0, 0, 1]) * 256
                            + int(img[0, 0, 2]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mime", "width", "height",
                    "sample_rate", "n_units", "sig_sum", "first_val",
                ],
            )

    return bin_df.mapInPandas(stats, schema=DECODE_SCHEMA)


def _sql_img_stats(
    mime: str, w: str, h: str, mult: int, step: int, chan: int = 3
) -> str:
    return f"""
      SELECT doc_id, '{mime}' AS mime,
             CAST({w} AS BIGINT) AS width, CAST({h} AS BIGINT) AS height,
             CAST(-1 AS BIGINT) AS sample_rate,
             CAST(({w}) * ({h}) AS BIGINT) AS n_units,
             CAST(list_sum(list_transform(range(0, ({w}) * ({h}) * {chan}),
                  i -> (doc_id * {mult} + i * {step}) % 256)) AS BIGINT)
               AS sig_sum,
             CAST(((doc_id * {mult}) % 256) * 65536
                  + ((doc_id * {mult} + {step}) % 256) * 256
                  + ((doc_id * {mult} + 2 * {step}) % 256) AS BIGINT)
               AS first_val
    """


@query(
    "multimodal_decode_stats",
    oracle=f"""
    WITH istats AS (
      {_sql_img_stats('image/x-portable-pixmap', '4 + doc_id % 5', '3', 31, 7)}
      FROM documents WHERE doc_id % 4 = 0
      UNION ALL
      {_sql_img_stats('image/bmp', '3 + doc_id % 4', '2', 17, 11)}
      FROM documents WHERE doc_id % 4 = 1
      UNION ALL
      {_sql_img_stats('image/png', '2 + doc_id % 3', '5', 23, 13, chan=4)}
      FROM documents WHERE doc_id % 4 = 3
    ),
    wstats AS (
      SELECT doc_id, 'audio/wav' AS mime,
             CAST(-1 AS BIGINT) AS width, CAST(-1 AS BIGINT) AS height,
             CAST(8000 + 250 * (doc_id % 7) AS BIGINT) AS sample_rate,
             CAST(16 + doc_id % 17 AS BIGINT) AS n_units,
             CAST(list_sum(list_transform(range(0, 16 + doc_id % 17),
                  i -> CAST(((doc_id * 13 + i * 5) % 65536) - 32768 AS BIGINT)
                       * (((doc_id * 13 + i * 5) % 65536) - 32768)))
               AS BIGINT) AS sig_sum,
             CAST(((doc_id * 13) % 65536) - 32768 AS BIGINT) AS first_val
      FROM documents WHERE doc_id % 4 = 2
    )
    SELECT * FROM istats UNION ALL SELECT * FROM wstats
    """,
)
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END media decode over the stdlib-expressible public
    formats: deterministic P6-PPM / 24-bit-BMP / PCM16-WAV / 8-bit-RGBA
    PNG payloads are ENCODED with real headers (synth_media), shipped
    as Arrow binary batches, and DECODED by decode_media's
    numpy+stdlib parsers; the reported stats come from the decoded
    arrays, while the DuckDB twin recomputes them from the generative
    formulas — so any header-parse, row-padding, bottom-up-flip,
    BGR-swap, chunk-walk, inflate, or scanline-unfilter bug
    hash-mismatches.  Two formats are deliberately adversarial: the
    BMP file stores bottom-up BGR with padded rows while the formula
    describes the logical top-down RGB image, and the PNG stores
    zlib-DEFLATEd scanlines with every one of the five public filter
    types (row r uses type (doc_id+r) % 5), so the decoder must run a
    real inflate plus correct Sub/Up/Average/Paeth inverses to match.

    Scale shape: both stages are partition-local mapInPandas over
    Arrow binary batches — no shuffle anywhere; at 100 TB the decode
    fleet scales with input splits and the stats output is a fixed
    8-column row per payload.  This retires the repo's one stub for
    every format whose byte layout is public-domain (PNG = zlib
    inflate + per-row unfiltering, both stdlib/numpy); lossy codecs
    (JPEG/MP3/H.264) remain the documented NotImplementedError
    dispatch arm."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_stats(synth_media(docs))
