"""Multimodal (image/audio/video) column lane (north-star extension;
reference analogues: tile decode `dataset_classes_v1.py:60-61` S3,
image transforms `ExperimentSetup_v2.py:106-127` M3, batch inference
`functions_v2.py:321-325` M2).

Media ride through the engine as opaque `binary` content columns
with typed metadata columns alongside — the multimodal-column model.
Per-item compute (decode, resize, feature-extract) runs in
Arrow-batched pandas iterators via `mapInPandas`: the ONLY sanctioned
Python hot path in the engine, because it moves whole record batches
across the JVM↔Python boundary instead of rows.

Image dimensions come from a REAL pure-Python container-header parse
(`parse_image_header`: JPEG SOF / PNG IHDR / GIF logical screen — no
image libraries needed). PNG payloads get a REAL pixel decode too
(`decode_png_pixels`: stdlib zlib inflate + scanline unfiltering for
every non-interlaced 8-bit color type), so mean intensity is the true
pixel statistic for PNGs. Only non-PNG pixel data (JPEG entropy
decode needs a DCT/huffman stack this container lacks) falls back to
a clearly-marked deterministic STUB derived from the bytes — the
Spark-side plumbing (schema contract, batch iteration, partition
sizing) is real and tested either way. Swap `_fake_decode` for
PIL/torchvision in production.

Scale notes: binary columns make wide rows — keep
`spark.sql.files.maxPartitionBytes` bounded and NEVER aggregate or
shuffle the content column itself (project it away before any wide
operation; sample/filter on path metadata BEFORE decode, the
reference's own "sample below decode" pushdown, SURVEY.md §4.1).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("mean_intensity", DoubleType()),
        # provenance of the decoded values, so stub fallbacks are
        # filterable instead of silently plausible:
        #   'real'   — true pixel decode (PNG 8/16-bit incl. Adam7,
        #              JPEG baseline AND progressive, GIF LZW)
        #   'header' — real dims from the container header, STUB
        #              intensity (arithmetic/12-bit JPEG, malformed-
        #              but-parseable payloads)
        #   'stub'   — unknown container, dims AND intensity are fake
        StructField("decode_status", StringType()),
    ]
)


def parse_image_header(content: bytes) -> tuple[int, int] | None:
    """REAL (width, height) from the container header — pure Python,
    no image libraries. Handles JPEG (scan to the first SOFn frame
    marker), PNG (IHDR) and GIF (logical screen descriptor); returns
    None for anything else so callers can fall back."""
    if not content:
        return None
    # PNG: 8-byte signature, then the IHDR chunk holds width/height
    # as big-endian uint32 at offsets 16/20
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 24:
        w = int.from_bytes(content[16:20], "big")
        h = int.from_bytes(content[20:24], "big")
        return (w, h) if w and h else None
    # GIF87a/GIF89a: logical-screen width/height, little-endian uint16
    if content[:4] == b"GIF8" and len(content) >= 10:
        w = int.from_bytes(content[6:8], "little")
        h = int.from_bytes(content[8:10], "little")
        return (w, h) if w and h else None
    # JPEG: walk the marker stream to the first start-of-frame (SOFn,
    # 0xC0-0xCF minus the non-frame C4/C8/CC); its payload is
    # precision(1) height(2) width(2), big-endian
    if content[:2] == b"\xff\xd8":
        i, n = 2, len(content)
        while i + 3 < n:
            if content[i] != 0xFF:
                i += 1
                continue
            marker = content[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if i + 4 > n:
                return None
            seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                h = int.from_bytes(content[i + 5 : i + 7], "big")
                w = int.from_bytes(content[i + 7 : i + 9], "big")
                return (w, h) if w and h else None
            i += 2 + seg_len
        return None
    return None


"""Adam7 pass geometry: (x_start, y_start, x_step, y_step). Each
pass is an independently-filtered sub-image; every pixel belongs to
exactly ONE pass, so a mean over all passes equals the image mean
without needing the de-interlaced positions."""
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def decode_png_pixels(content: bytes) -> tuple[int, int, float] | None:
    """REAL (width, height, mean_intensity∈[0,1]) from a PNG payload —
    stdlib-only pixel decode: chunk walk, zlib inflate of the IDAT
    stream, then per-scanline unfiltering (None/Sub/Up/Average/Paeth,
    the five filters of the PNG spec). Supports 8- and 16-bit images
    of every color type (gray, RGB, palette, gray+alpha, RGBA;
    16-bit scaled by 65535 — the microscopy-tile depth), interlaced
    (Adam7 — each pass unfilters as its own sub-image) or not;
    intensity is the mean over color channels (alpha and palette
    indirection handled). Returns None for anything else (1/2/4-bit,
    truncated) so callers can fall back."""
    if len(content) < 45 or content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    import zlib

    width = height = None
    bit_depth = color_type = interlace = None
    palette: bytes | None = None
    idat = bytearray()
    i, n = 8, len(content)
    while i + 8 <= n:
        size = int.from_bytes(content[i : i + 4], "big")
        cid = content[i + 4 : i + 8]
        body = content[i + 8 : i + 8 + size]
        if len(body) < size:
            return None
        if cid == b"IHDR" and size >= 13:
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            bit_depth, color_type = body[8], body[9]
            interlace = body[12]
        elif cid == b"PLTE":
            palette = bytes(body)
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        i += 12 + size  # length + type + body + CRC
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if (
        not width
        or not height
        or channels is None
        or bit_depth not in (8, 16)
        or (bit_depth == 16 and color_type == 3)  # spec: no 16-bit palette
        or interlace not in (0, 1)
        or not idat
        or (color_type == 3 and palette is None)
    ):
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None

    sample_bytes = bit_depth // 8
    bpp = channels * sample_bytes  # filter distance, per spec, in BYTES
    denom = 255.0 if bit_depth == 8 else 65535.0
    total = 0
    n_vals = 0
    pos = 0

    def accumulate_subimage(w: int, h: int) -> bool:
        """Unfilter + accumulate one sub-image (the whole image, or
        one Adam7 pass) of w×h pixels starting at `pos` in `raw`.
        Filters operate bytewise at distance `bpp` (so the same code
        serves 8- and 16-bit depths); accumulation reads samples at
        the declared depth."""
        nonlocal total, n_vals, pos
        stride = w * bpp
        if len(raw) - pos < h * (stride + 1):
            return False
        prev = bytearray(stride)
        for _ in range(h):
            ftype = raw[pos]
            line = bytearray(raw[pos + 1 : pos + 1 + stride])
            pos += 1 + stride
            if ftype == 1:  # Sub
                for x in range(bpp, stride):
                    line[x] = (line[x] + line[x - bpp]) & 0xFF
            elif ftype == 2:  # Up
                for x in range(stride):
                    line[x] = (line[x] + prev[x]) & 0xFF
            elif ftype == 3:  # Average
                for x in range(stride):
                    a = line[x - bpp] if x >= bpp else 0
                    line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(stride):
                    a = line[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[x] = (line[x] + pred) & 0xFF
            elif ftype != 0:
                return False
            if bit_depth == 16:
                # big-endian 16-bit samples; channel layout repeats
                # per pixel, so select color channels by sample index
                for si in range(0, stride, 2):
                    ch = (si // 2) % channels
                    if color_type == 4 and ch == 1:
                        continue  # alpha
                    if color_type == 6 and ch == 3:
                        continue  # alpha
                    total += (line[si] << 8) | line[si + 1]
                    n_vals += 1
            # 8-bit: accumulate color channels only (skip alpha;
            # expand palette)
            elif color_type == 3:
                if line and max(line) * 3 + 2 >= len(palette):
                    # palette index beyond PLTE: malformed file —
                    # decline rather than fail the Spark task
                    return False
                for v in line:
                    base = 3 * v
                    total += palette[base] + palette[base + 1] + palette[base + 2]
                    n_vals += 3
            elif color_type in (0, 2):
                total += sum(line)
                n_vals += stride
            elif color_type == 4:  # gray + alpha: even indices are gray
                total += sum(line[0::2])
                n_vals += w
            else:  # 6: RGBA — drop every 4th byte (alpha)
                for x in range(0, stride, 4):
                    total += line[x] + line[x + 1] + line[x + 2]
                n_vals += 3 * w
            prev = line
        return True

    if interlace == 0:
        if not accumulate_subimage(width, height):
            return None
    else:
        # Adam7: each non-empty pass is its own filtered sub-image;
        # pixel VALUES (all we need for the mean) appear exactly once
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            if not accumulate_subimage(pw, ph):
                return None
    if not n_vals:
        return None
    return width, height, total / n_vals / denom


def _fake_decode(content: bytes) -> tuple[int, int, float]:
    """STUB decode: deterministic pseudo-dimensions/intensity from the
    byte payload, used only when `parse_image_header` can't read the
    container (unknown format / synthetic payloads). Replace with
    `PIL.Image.open(io.BytesIO(content))` where image libs exist;
    raise NotImplementedError there if you need a hard failure
    instead of fake values."""
    digest = hashlib.md5(content or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    mean_intensity = digest[2] / 255.0
    return width, height, mean_intensity


def _decode(content: bytes) -> tuple[int, int, float, str]:
    """(width, height, mean_intensity, decode_status).

    PNG, JPEG (baseline AND progressive) and GIF (LZW, first frame):
    real pixel decode (dims + true mean intensity — stdlib-only
    decoders, see `decode_png_pixels`, `operators/jpeg.py`,
    `operators/gif.py`) → status 'real'. Other recognized containers
    (arithmetic/12-bit JPEG, malformed-but-parseable headers): real
    header dims, stub intensity → status 'header'. Unknown payloads:
    deterministic stub → status 'stub'. Filter on decode_status
    before trusting mean_intensity downstream."""
    from patientdataintegration_spark.operators.gif import decode_gif_pixels
    from patientdataintegration_spark.operators.jpeg import decode_jpeg_pixels

    px = decode_png_pixels(content)
    if px is None:
        px = decode_jpeg_pixels(content)
    if px is None:
        px = decode_gif_pixels(content)
    if px is not None:
        return (*px, "real")
    dims = parse_image_header(content)
    fake_w, fake_h, intensity = _fake_decode(content)
    if dims is not None:
        return dims[0], dims[1], intensity, "header"
    return fake_w, fake_h, intensity, "stub"


def image_features(df: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """Decode + featurize a binary image column via mapInPandas.

    Input: any DataFrame with (path string, content binary). Output:
    IMAGE_FEATURES_SCHEMA. The iterator-of-batches form keeps memory
    at one Arrow batch per task regardless of partition size.
    """
    cols = df.select(F.col(path_col).alias("path"), F.col(content_col).alias("content"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode(c if c is not None else b"") for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "mean_intensity": [d[2] for d in decoded],
                    "decode_status": [d[3] for d in decoded],
                }
            )

    return cols.mapInPandas(decode_batches, IMAGE_FEATURES_SCHEMA)


IMAGE_DHASH_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("dhash", StringType()),  # 16 hex chars = 64 bits
        # 'real' — hash over true decoded pixels; 'unsupported' — the
        # payload is not a decodable non-interlaced 8-bit PNG: dhash
        # is NULL, never a plausible fake (a fake perceptual hash
        # would silently create false dedup matches)
        StructField("dhash_status", StringType()),
    ]
)


def decode_png_gray_grid(
    content: bytes, gw: int = 9, gh: int = 8
) -> tuple[int, int, list[list[int]], list[list[int]]] | None:
    """(width, height, gh x gw integer channel-sum grid, matching
    pixel-count grid) from a non-interlaced 8-bit PNG — the
    downsample step of perceptual hashing, stdlib-only like
    `decode_png_pixels` (chunk walk, zlib inflate, scanline
    unfiltering for filters 0-4, palette/alpha handled; intensity =
    mean over COLOR channels). Cell means are represented EXACTLY as
    (integer sum, count) pairs instead of accumulated floats: float
    accumulation can differ by 1 ulp between cells whose true means
    are equal, and `dhash64`'s strict comparison would turn that ulp
    into a hash bit — a perceptual hash must never differ on
    identical content (falsified by the r5 brightness-shift property
    before this fix). The per-pixel denominator (255 for gray, 765
    for RGB) is constant per image, so it cancels in every
    cross-multiplied cell comparison. Images smaller than the grid,
    16-bit depth, and Adam7 return None — callers surface an explicit
    unsupported status instead of a fake hash."""
    if len(content) < 45 or content[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    import zlib

    width = height = None
    bit_depth = color_type = interlace = None
    palette: bytes | None = None
    idat = bytearray()
    i, n = 8, len(content)
    while i + 8 <= n:
        size = int.from_bytes(content[i : i + 4], "big")
        cid = content[i + 4 : i + 8]
        body = content[i + 8 : i + 8 + size]
        if len(body) < size:
            return None
        if cid == b"IHDR" and size >= 13:
            width = int.from_bytes(body[0:4], "big")
            height = int.from_bytes(body[4:8], "big")
            bit_depth, color_type = body[8], body[9]
            interlace = body[12]
        elif cid == b"PLTE":
            palette = bytes(body)
        elif cid == b"IDAT":
            idat += body
        elif cid == b"IEND":
            break
        i += 12 + size
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if (
        not width
        or not height
        or width < gw
        or height < gh
        or channels is None
        or bit_depth != 8
        or interlace != 0
        or not idat
        or (color_type == 3 and palette is None)
    ):
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) < height * (stride + 1):
        return None

    sums = [[0] * gw for _ in range(gh)]
    counts = [[0] * gw for _ in range(gh)]
    prev = bytearray(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for x in range(channels, stride):
                line[x] = (line[x] + line[x - channels]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        elif ftype != 0:
            return None
        prev = line
        gy = y * gh // height
        for x in range(width):
            base = x * channels
            if color_type == 0:
                v = line[base]
            elif color_type == 2:
                v = line[base] + line[base + 1] + line[base + 2]
            elif color_type == 3:
                pi = line[base] * 3
                if pi + 3 > len(palette):
                    return None
                v = palette[pi] + palette[pi + 1] + palette[pi + 2]
            elif color_type == 4:
                v = line[base]
            else:  # RGBA
                v = line[base] + line[base + 1] + line[base + 2]
            gx = x * gw // width
            sums[gy][gx] += v
            counts[gy][gx] += 1
    return width, height, sums, counts


def dhash64(sums: list[list[int]], counts: list[list[int]]) -> str:
    """Classic difference hash over a gh x (gw=9) grid of exact cell
    means, each represented as (integer channel sum, pixel count):
    bit (r, c) = 1 iff cell (r, c+1) is brighter than (r, c), decided
    by the cross-multiplied INTEGER comparison sum[r][c+1]*cnt[r][c]
    > sum[r][c]*cnt[r][c+1] — mathematically identical to comparing
    the rational means, with no float rounding to flip bits on ties.
    8 rows x 8 comparisons = 64 bits, rendered as 16 hex chars
    (string form sidesteps int64 sign wraparound and groups/joins
    fine: equality and banding are what dedup needs, not
    arithmetic)."""
    bits = 0
    for r in range(len(sums)):
        for c in range(len(sums[r]) - 1):
            brighter = (
                sums[r][c + 1] * counts[r][c] > sums[r][c] * counts[r][c + 1]
            )
            bits = (bits << 1) | (1 if brighter else 0)
    return f"{bits:016x}"


def image_dhash(
    df: DataFrame, path_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """Perceptual difference-hash of a binary image column — the
    image-dedup primitive (near-identical images produce hamming-
    close hashes; exact re-encodes of the same pixels produce EQUAL
    hashes). Arrow-batched mapInPandas like `image_features`; decode
    failures surface as dhash_status='unsupported' with a NULL hash
    rather than a fake (a fabricated perceptual hash would create
    false dedup matches downstream). Scale: project away `content`
    immediately after this operator; group/band on the 16-char hash."""
    cols = df.select(
        F.col(path_col).alias("path"), F.col(content_col).alias("content")
    )

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"path": [], "width": [], "height": [], "dhash": [], "dhash_status": []}
            for path, c in zip(pdf["path"], pdf["content"]):
                c = c if c is not None else b""
                decoded = decode_png_gray_grid(c)
                out["path"].append(path)
                if decoded is None:
                    dims = parse_image_header(c)
                    out["width"].append(dims[0] if dims else 0)
                    out["height"].append(dims[1] if dims else 0)
                    out["dhash"].append(None)
                    out["dhash_status"].append("unsupported")
                else:
                    w, h, gsums, gcounts = decoded
                    out["width"].append(w)
                    out["height"].append(h)
                    out["dhash"].append(dhash64(gsums, gcounts))
                    out["dhash_status"].append("real")
            yield pd.DataFrame(out)

    return cols.mapInPandas(hash_batches, IMAGE_DHASH_SCHEMA)


def dhash_neardup_pairs(
    hashes: DataFrame,
    path_col: str = "path",
    hash_col: str = "dhash",
    max_hamming: int = 6,
) -> DataFrame:
    """Near-duplicate image pairs by dHash hamming distance, banded:
    the 16-hex hash splits into 8 bands of 2 hex chars (8 bits each).
    Pigeonhole: hamming distance h can make at most h bands differ,
    so any pair within h <= 7 — which COVERS the default threshold
    of 6 — shares at least one exact band and is found by the 8
    cheap equi-joins on (band_idx, band_value); never all-pairs. (4
    wider bands would only guarantee h <= 3: differing bits can land
    one-per-band.) The exact hamming popcount over the 64-bit values
    then prunes candidates to the threshold. Same blocking shape as
    the SimHash lane (`dedup.simhash_hamming_pairs`)."""
    n_bands = 8
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"banding guarantees recall only for max_hamming <= {n_bands - 1}"
        )
    h = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(path_col).alias("p"), F.col(hash_col).alias("hh")
    )
    banded = h.select(
        "p",
        "hh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.substring(F.col("hh"), b * 2 + 1, 2).alias("bv"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("p", "hh", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.p") < F.col("b.p")),
        )
        .select(
            F.col("a.p").alias("path_a"),
            F.col("a.hh").alias("ha"),
            F.col("b.p").alias("path_b"),
            F.col("b.hh").alias("hb"),
        )
        .distinct()
    )
    def _half(col: str, start: int):
        # conv() of a full 16-hex value is unsigned-64 and overflows
        # a BIGINT cast when the top bit is set; 8-hex halves are
        # always < 2^32 and cast safely
        return F.conv(F.substring(F.col(col), start, 8), 16, 10).cast("bigint")

    hamming = F.bit_count(
        _half("ha", 1).bitwiseXOR(_half("hb", 1))
    ) + F.bit_count(_half("ha", 9).bitwiseXOR(_half("hb", 9)))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("path_a", "path_b", "hamming")
    )


def synthetic_tiles(df: DataFrame, key_col: str, name_col: str) -> DataFrame:
    """Build a (path, content) tile relation from any table — gives the
    multimodal lane a deterministic test input without real files:
    path mimics the reference's `<base>/<slide>/<name>_<col>_<row>.jpg`
    layout (`dataset_classes_v1.py:62,70-71`), content is the
    utf-8 bytes of the name (opaque payload)."""
    path = F.concat(
        F.lit("/synthetic/"),
        F.col(name_col),
        F.lit("/t_"),
        (F.col(key_col) % 16).cast("string"),
        F.lit("_"),
        (F.col(key_col) % 23).cast("string"),
        F.lit(".jpg"),
    )
    return df.select(path.alias("path"), F.encode(F.col(name_col), "utf-8").alias("content"))


def synthetic_pngs(
    df: DataFrame, key_col: str, base_w: int = 4, base_h: int = 4
) -> DataFrame:
    """Deterministic (path, content) relation of REAL grayscale PNGs
    built from any table — the image twin of `synthetic_wavs`: each
    row's key seeds the dimensions and a gradient pixel pattern, the
    container is a genuine spec-compliant PNG (zlib-deflated IDAT,
    CRC'd chunks), so `image_features` exercises the REAL pixel
    decoder end-to-end with exactly predictable mean intensity."""
    import zlib

    keys = df.select(F.col(key_col).cast("bigint").alias("k"))

    def png_of(k: int) -> bytes:
        w, h = base_w + (k % 13), base_h + (k % 7)
        rows = bytearray()
        for y in range(h):
            rows.append(0)  # filter: None
            rows += bytes(((k + x * y) * 31) % 256 for x in range(w))

        def chunk(cid: bytes, body: bytes) -> bytes:
            return (
                len(body).to_bytes(4, "big")
                + cid
                + body
                + zlib.crc32(cid + body).to_bytes(4, "big")
            )

        ihdr = (
            w.to_bytes(4, "big")
            + h.to_bytes(4, "big")
            + bytes([8, 0, 0, 0, 0])  # 8-bit gray, non-interlaced
        )
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(rows)))
            + chunk(b"IEND", b"")
        )

    def gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": [f"/synthetic/img/{k}.png" for k in pdf["k"]],
                    "content": [png_of(int(k)) for k in pdf["k"]],
                }
            )

    schema = StructType(
        [StructField("path", StringType()), StructField("content", BinaryType())]
    )
    return keys.mapInPandas(gen_batches, schema)


VIDEO_FRAMES_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", StringType()),  # binary-ish token; real: BinaryType
    ]
)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Sample every-Nth "frame" from a binary video payload
    (M3-family: the temporal analogue of tile sampling W1 — sample
    BEFORE any per-frame decode cost, the same below-the-decode
    pushdown as the reference's tile sampler).

    STUB decode: frames are derived deterministically from the
    payload bytes (a real build decodes with pyav/ffmpeg inside the
    same mapInPandas shape). One input row fans out to <= max_frames
    rows; the iterator form bounds memory to one Arrow batch."""
    cols = df.select(F.col(path_col).alias("path"), F.col(content_col).alias("content"))

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_path, out_idx, out_frame = [], [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = content if content is not None else b""
                n_virtual = max(len(payload), 1)
                for j, idx in enumerate(range(0, n_virtual, every_n)):
                    if j >= max_frames:
                        break
                    digest = hashlib.md5(payload + idx.to_bytes(4, "big")).hexdigest()
                    out_path.append(path)
                    out_idx.append(idx)
                    out_frame.append(digest[:16])
            yield pd.DataFrame(
                {"path": out_path, "frame_idx": out_idx, "frame": out_frame}
            )

    return cols.mapInPandas(sample_batches, VIDEO_FRAMES_SCHEMA)


INFERENCE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("score", DoubleType()),
    ]
)


def batch_inference(df: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """M2 (CNN batch inference, `functions_v2.py:321-325`) as a
    scalar-iterator lane: the model loads ONCE per Python worker (in
    production: torch weights to GPU), then scores every Arrow batch
    the task streams through — the mapInPandas shape that makes
    per-batch model amortization explicit. STUB model: a fixed
    byte-histogram dot product, deterministic and library-free."""
    cols = df.select(F.col(path_col).alias("path"), F.col(content_col).alias("content"))

    def infer_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # "model load" happens here: once per task/worker, NOT per batch
        weights = [((i * 2654435761) % 1000) / 1000.0 - 0.5 for i in range(256)]

        def score(payload: bytes) -> float:
            if not payload:
                return 0.0
            acc = 0.0
            for b in payload[:1024]:
                acc += weights[b]
            return acc / min(len(payload), 1024)

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "score": [
                        score(c if c is not None else b"") for c in pdf["content"]
                    ],
                }
            )

    return cols.mapInPandas(infer_batches, INFERENCE_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [  # header metadata + REAL PCM sample statistics (null when the
       # payload is not decodable PCM)
        StructField("path", StringType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits_per_sample", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("n_bytes", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", DoubleType()),
        StructField("zero_cross_rate", DoubleType()),
    ]
)


def parse_wav_header(content: bytes) -> tuple[int, int, int, int] | None:
    """REAL (sample_rate, channels, bits_per_sample, n_samples) from a
    RIFF/WAVE container header — pure Python chunk walk (the shared
    `_riff_chunks` iterator, defined with the video lane below), no
    audio libraries. Returns None for non-WAV payloads so callers can
    fall back (the audio twin of `parse_image_header`). n_samples
    reflects the data chunk's DECLARED size (the header-level claim);
    sample-level truncation handling lives in `decode_wav_samples`."""
    if len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    sample_rate = channels = bits = block_align = None
    n_samples = 0
    for cid, off, size in _riff_chunks(content, 12, len(content)):
        body = content[off : off + size]
        if cid == b"fmt " and len(body) >= 16:
            channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data" and block_align:
            n_samples = size // block_align
    if not (sample_rate and channels and bits):
        return None
    return sample_rate, channels, bits, n_samples


def decode_wav_samples(content: bytes):
    """REAL PCM sample decode from a RIFF/WAVE payload: returns a
    float64 numpy array shaped (n_frames, channels), normalized to
    [-1, 1) — the audio twin of `decode_png_pixels` (header-only
    metadata was the r4 gap this closes). Pure stdlib + numpy:
    supports PCM (format 1) at 8 (unsigned), 16 and 32 (signed LE)
    bits; returns None for non-WAV, compressed, or malformed
    payloads so callers fall back to header-only rows. A data chunk
    whose declared size overruns the payload is decoded to the last
    WHOLE frame actually present (truncation declines gracefully
    per-frame, not per-file)."""
    import numpy as np

    if len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        return None
    audio_format = sample_rate = channels = bits = block_align = None
    data = None
    for cid, off, size in _riff_chunks(content, 12, len(content)):
        body = content[off : off + size]
        if cid == b"fmt " and len(body) >= 16:
            audio_format = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            data = body
    if (
        audio_format != 1
        or not (sample_rate and channels and bits and block_align)
        or data is None
    ):
        return None
    try:
        if bits == 16:
            dt, scale, offset = "<i2", 32768.0, 0.0
        elif bits == 32:
            dt, scale, offset = "<i4", 2147483648.0, 0.0
        elif bits == 8:
            dt, scale, offset = "u1", 128.0, 128.0
        else:
            return None
        usable = (len(data) // block_align) * block_align
        if usable == 0:
            return None
        arr = np.frombuffer(bytes(data[:usable]), dtype=dt).astype(np.float64)
        arr = (arr - offset) / scale
        return arr.reshape(-1, channels)
    except (ValueError, ZeroDivisionError):
        return None


def audio_features(df: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """Decode + featurize a binary audio column via mapInPandas: real
    RIFF/WAVE header metadata (rate, channels, bit depth, sample
    count, duration) AND real PCM sample statistics (RMS, peak,
    zero-crossing rate over the first channel — `decode_wav_samples`);
    unknown containers surface as nulls rather than fakes (audio has
    no meaningful deterministic stub — the row is still emitted so
    joins don't drop media). Same iterator-batch contract as
    `image_features`."""
    cols = df.select(F.col(path_col).alias("path"), F.col(content_col).alias("content"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                parsed = parse_wav_header(payload)
                if parsed is None:
                    rows.append(
                        (path, None, None, None, None, None, len(payload),
                         None, None, None)
                    )
                else:
                    rate, ch, bits, n_samp = parsed
                    rms = peak = zcr = None
                    samples = decode_wav_samples(payload)
                    if samples is not None and len(samples):
                        import numpy as np

                        first = samples[:, 0]
                        rms = float(np.sqrt(np.mean(first * first)))
                        peak = float(np.max(np.abs(first)))
                        if len(first) > 1:
                            zcr = float(
                                np.count_nonzero(
                                    np.signbit(first[1:]) != np.signbit(first[:-1])
                                )
                            ) / (len(first) - 1)
                    rows.append(
                        (
                            path,
                            rate,
                            ch,
                            bits,
                            n_samp,
                            n_samp / rate if rate else None,
                            len(payload),
                            rms,
                            peak,
                            zcr,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "sample_rate",
                    "channels",
                    "bits_per_sample",
                    "n_samples",
                    "duration_s",
                    "n_bytes",
                    "rms",
                    "peak",
                    "zero_cross_rate",
                ],
            )

    return cols.mapInPandas(decode_batches, AUDIO_FEATURES_SCHEMA)


def synthetic_wavs(df: DataFrame, key_col: str, rate: int = 8000) -> DataFrame:
    """Deterministic (path, content) WAV relation from any table — the
    audio twin of `synthetic_tiles`: real RIFF/WAVE containers built
    in the Arrow batch lane (each row's sample count derives from its
    key), so `audio_features` exercises the REAL header parser
    without any files on disk."""
    keys = df.select(F.col(key_col).cast("bigint").alias("k"))

    def gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def wav_of(k: int) -> bytes:
            channels, bits = 1 + (k % 2), 16
            block = channels * bits // 8
            n_samples = 100 + (k % 400)
            data_size = n_samples * block
            fmt = (
                (1).to_bytes(2, "little")
                + channels.to_bytes(2, "little")
                + rate.to_bytes(4, "little")
                + (rate * block).to_bytes(4, "little")
                + block.to_bytes(2, "little")
                + bits.to_bytes(2, "little")
            )
            body = b"WAVEfmt " + (16).to_bytes(4, "little") + fmt
            body += b"data" + data_size.to_bytes(4, "little")
            body += bytes((hashlib.md5((str(k) + str(i)).encode()).digest()[0]) % 256
                          for i in range(min(data_size, 64)))
            body += b"\x00" * max(0, data_size - 64)
            return b"RIFF" + len(body).to_bytes(4, "little") + body

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": [f"/synthetic/audio/{k}.wav" for k in pdf["k"]],
                    "content": [wav_of(int(k)) for k in pdf["k"]],
                }
            )

    schema = StructType(
        [StructField("path", StringType()), StructField("content", BinaryType())]
    )
    return keys.mapInPandas(gen_batches, schema)


# --- REAL video container lane: AVI (RIFF) parse + uncompressed frames ------
#
# The video twin of the PNG/JPEG/GIF and WAV-PCM work: `frame_sample`
# above remains the codec-agnostic STUB sampler; the functions below
# decode a real container format end-to-end with stdlib only —
# RIFF 'AVI ' chunk walk for metadata, and actual pixel frames for
# uncompressed (BI_RGB '00db') streams. Compressed streams parse to
# metadata with frame stats declined to null (codecs are out of
# scope by design; the Spark-side plumbing — schema, fan-out,
# Arrow batching — is identical either way).

VIDEO_META_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("container", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("fps", DoubleType()),
        StructField("duration_s", DoubleType()),
        StructField("codec", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def _riff_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_size) over a RIFF chunk run.
    `end` is clamped to the REAL buffer length: nested walks pass
    the container's DECLARED size as the bound, and a corrupt size
    field (e.g. 0xFFFFFFF0) would otherwise spin this loop hundreds
    of millions of iterations past the data."""
    end = min(end, len(buf))
    i = start
    while i + 8 <= end:
        cid = buf[i : i + 4]
        size = int.from_bytes(buf[i + 4 : i + 8], "little")
        yield cid, i + 8, size
        i += 8 + size + (size & 1)


def parse_avi_header(content: bytes):
    """REAL (width, height, n_frames, fps, codec_fourcc) from a
    RIFF/AVI container — pure chunk walk, no codec. None for
    non-AVI/malformed payloads."""
    if len(content) < 24 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        return None
    width = height = None
    n_frames = 0
    fps = None
    codec = None
    for cid, off, size in _riff_chunks(content, 12, len(content)):
        if cid != b"LIST" or content[off : off + 4] != b"hdrl":
            continue
        for c2, o2, s2 in _riff_chunks(content, off + 4, off + size):
            if c2 == b"avih" and s2 >= 40:
                us_pf = int.from_bytes(content[o2 : o2 + 4], "little")
                n_frames = int.from_bytes(content[o2 + 16 : o2 + 20], "little")
                width = int.from_bytes(content[o2 + 32 : o2 + 36], "little")
                height = int.from_bytes(content[o2 + 36 : o2 + 40], "little")
                fps = 1e6 / us_pf if us_pf else None
            elif c2 == b"LIST" and content[o2 : o2 + 4] == b"strl":
                for c3, o3, s3 in _riff_chunks(content, o2 + 4, o2 + s2):
                    if c3 == b"strh" and s3 >= 8:
                        if content[o3 : o3 + 4] == b"vids":
                            codec = content[o3 + 4 : o3 + 8].decode(
                                "ascii", "replace"
                            )
    if width is None:
        return None
    return width, height, n_frames, fps, codec


def decode_avi_frames(content: bytes, every_n: int = 1, max_frames: int = 64):
    """REAL pixel frames from an UNCOMPRESSED ('DIB '/BI_RGB, 24-bit)
    AVI: yields (frame_idx, numpy HxWx3 RGB uint8) for every
    `every_n`-th '00db' chunk in the 'movi' list, up to `max_frames`.
    DIB rows are bottom-up BGR with 4-byte row padding — both are
    undone. Compressed ('00dc') or malformed frames are skipped."""
    import numpy as np

    hdr = parse_avi_header(content)
    if hdr is None:
        return
    width, height, _, _, _ = hdr
    if not (width and height):
        return
    row_bytes = (width * 3 + 3) & ~3
    need = row_bytes * height
    emitted = 0
    frame_idx = 0
    for cid, off, size in _riff_chunks(content, 12, len(content)):
        if cid != b"LIST" or content[off : off + 4] != b"movi":
            continue
        for c2, o2, s2 in _riff_chunks(content, off + 4, off + size):
            if c2[2:4] not in (b"db", b"dc"):
                continue
            this_idx = frame_idx
            frame_idx += 1
            if this_idx % every_n != 0:
                continue
            if emitted >= max_frames:
                return
            if c2[2:4] != b"db" or s2 < need or o2 + need > len(content):
                # compressed, short, or TRUNCATED frame (declared
                # size beyond the actual payload): no pixels —
                # skip the frame, never fail the task
                continue
            raw = np.frombuffer(
                bytes(content[o2 : o2 + need]), dtype=np.uint8
            ).reshape(height, row_bytes)
            bgr = raw[:, : width * 3].reshape(height, width, 3)
            rgb = bgr[::-1, :, ::-1]  # bottom-up -> top-down, BGR -> RGB
            emitted += 1
            yield this_idx, rgb


def video_frame_features(
    df: DataFrame,
    every_n: int = 2,
    max_frames: int = 8,
    path_col: str = "path",
    content_col: str = "content",
) -> DataFrame:
    """Per-frame REAL pixel statistics from binary AVI payloads via
    mapInPandas (one input row fans out to <= max_frames frame rows):
    mean intensity and per-channel means from the actual decoded
    RGB planes. Rows for non-AVI payloads are dropped (no fake
    frames); compressed-codec AVIs yield zero frame rows but their
    METADATA remains reachable via `video_metadata`."""
    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("frame_idx", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mean_intensity", DoubleType()),
            StructField("mean_r", DoubleType()),
            StructField("mean_g", DoubleType()),
            StructField("mean_b", DoubleType()),
        ]
    )
    cols = df.select(F.col(path_col).alias("path"), F.col(content_col).alias("content"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                for idx, rgb in decode_avi_frames(
                    payload, every_n=every_n, max_frames=max_frames
                ):
                    h, w, _ = rgb.shape
                    rows.append(
                        (
                            path,
                            idx,
                            w,
                            h,
                            float(rgb.mean()),
                            float(rgb[:, :, 0].mean()),
                            float(rgb[:, :, 1].mean()),
                            float(rgb[:, :, 2].mean()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "frame_idx", "width", "height",
                    "mean_intensity", "mean_r", "mean_g", "mean_b",
                ],
            )

    return cols.mapInPandas(decode_batches, schema)


def video_metadata(df: DataFrame, path_col: str = "path", content_col: str = "content") -> DataFrame:
    """Container-level REAL metadata for binary video payloads (the
    video twin of `audio_features`' header half): AVI via the RIFF
    chunk walk, MP4/ISO-BMFF via the box walk (`parse_mp4_header`);
    unrecognized rows survive with nulls so joins don't drop
    media."""
    cols = df.select(F.col(path_col).alias("path"), F.col(content_col).alias("content"))

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                payload = bytes(content) if content is not None else b""
                hdr = parse_avi_header(payload)
                if hdr is not None:
                    w, h, nf, fps, codec = hdr
                    dur = (nf / fps) if (fps and nf) else None
                    rows.append(
                        (path, "avi", w, h, nf, fps, dur, codec, len(payload))
                    )
                    continue
                mp4 = parse_mp4_header(payload)
                if mp4 is not None:
                    dur, w, h, brand, _ = mp4
                    rows.append(
                        (path, "mp4", w, h, None, None, dur, brand, len(payload))
                    )
                    continue
                rows.append(
                    (path, None, None, None, None, None, None, None, len(payload))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "container", "width", "height", "n_frames",
                    "fps", "duration_s", "codec", "n_bytes",
                ],
            )

    return cols.mapInPandas(parse_batches, VIDEO_META_SCHEMA)


def synthetic_avis(df: DataFrame, key_col: str, width: int = 8, height: int = 6) -> DataFrame:
    """Deterministic (path, content) relation of REAL uncompressed
    AVI containers built in the Arrow batch lane — the video twin of
    `synthetic_wavs`: per key, 2 + (k % 4) frames of 24-bit BI_RGB
    pixels whose values derive from (k, frame, y, x), so
    `video_frame_features` exercises the REAL DIB decode with
    hand-computable statistics."""
    keys = df.select(F.col(key_col).cast("bigint").alias("k"))
    row_bytes = (width * 3 + 3) & ~3

    def avi_of(k: int) -> bytes:
        n_frames = 2 + (k % 4)
        frames = []
        for f in range(n_frames):
            raw = bytearray()
            for y in range(height - 1, -1, -1):  # bottom-up storage
                row = bytearray()
                for x in range(width):
                    v = (k * 31 + f * 17 + y * 5 + x * 3) % 256
                    row += bytes((v, v, v))  # B, G, R equal
                row += b"\x00" * (row_bytes - len(row))
                raw += row
            frames.append(bytes(raw))

        def chunk(cid: bytes, body: bytes) -> bytes:
            return cid + len(body).to_bytes(4, "little") + body + (
                b"\x00" if len(body) & 1 else b""
            )

        avih = (
            (40000).to_bytes(4, "little")          # us per frame (25 fps)
            + (0).to_bytes(4, "little")
            + (0).to_bytes(4, "little")
            + (0).to_bytes(4, "little")
            + n_frames.to_bytes(4, "little")
            + (0).to_bytes(4, "little")
            + (1).to_bytes(4, "little")
            + (0).to_bytes(4, "little")
            + width.to_bytes(4, "little")
            + height.to_bytes(4, "little")
            + b"\x00" * 16
        )
        strh = (
            # AVISTREAMHEADER: fccType(0) fccHandler(4) dwFlags(8)
            # wPriority(12) wLanguage(14) dwInitialFrames(16)
            # dwScale(20) dwRate(24) dwStart(28) dwLength(32)
            # dwSuggestedBufferSize(36) dwQuality(40)
            # dwSampleSize(44) rcFrame(48..56)
            b"vids" + b"DIB " + b"\x00" * 12
            + (1).to_bytes(4, "little")            # dwScale
            + (25).to_bytes(4, "little")           # dwRate -> 25 fps
            + (0).to_bytes(4, "little")            # dwStart
            + n_frames.to_bytes(4, "little")       # dwLength
            + b"\x00" * 20                         # sugbuf/quality/smpsize/rcFrame
        )
        strf = (
            (40).to_bytes(4, "little")
            + width.to_bytes(4, "little")
            + height.to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")            # BI_RGB
            + (row_bytes * height).to_bytes(4, "little")
            + b"\x00" * 16
        )
        strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
        hdrl = b"hdrl" + chunk(b"avih", avih) + chunk(b"LIST", strl)
        movi = b"movi" + b"".join(chunk(b"00db", fr) for fr in frames)
        body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    def gen_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "path": [f"/synthetic/video/{k}.avi" for k in pdf["k"]],
                    "content": [avi_of(int(k)) for k in pdf["k"]],
                }
            )

    schema = StructType(
        [StructField("path", StringType()), StructField("content", BinaryType())]
    )
    return keys.mapInPandas(gen_batches, schema)


def parse_mp4_header(content: bytes):
    """REAL (duration_s, width, height, major_brand, n_tracks) from an
    ISO-BMFF / MP4 container — a pure box walk (ftyp, moov/mvhd for
    timescale+duration, trak/tkhd for track count and visual
    dimensions), no codec work. The second container format of the
    video lane (AVI being the first); returns None for non-MP4
    payloads. Box sizes: 32-bit, with 64-bit `size==1` largesize
    supported; mvhd/tkhd version 0 and 1 both handled."""

    def boxes(buf, start, end):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(buf[i : i + 4], "big")
            btype = buf[i + 4 : i + 8]
            hdr = 8
            if size == 1 and i + 16 <= end:
                size = int.from_bytes(buf[i + 8 : i + 16], "big")
                hdr = 16
            elif size == 0:
                size = end - i
            if size < hdr:
                return
            yield btype, i + hdr, min(i + size, end)
            i += size

    n = len(content)
    if n < 12:
        return None
    first = list(boxes(content, 0, n))
    if not first or first[0][0] != b"ftyp":
        return None
    major = content[first[0][1] : first[0][1] + 4].decode("ascii", "replace")
    duration_s = width = height = None
    n_tracks = 0
    for btype, s, e in first:
        if btype != b"moov":
            continue
        for b2, s2, e2 in boxes(content, s, e):
            if b2 == b"mvhd" and e2 - s2 >= 20:
                ver = content[s2]
                # v1 needs 32 body bytes for its 64-bit duration; a
                # SHORT v1 box must decline, never fall into the v0
                # layout (whose offsets would read v1 mtime bytes as
                # timescale/duration garbage)
                if ver == 1:
                    if e2 - s2 >= 32:
                        timescale = int.from_bytes(
                            content[s2 + 20 : s2 + 24], "big"
                        )
                        duration = int.from_bytes(
                            content[s2 + 24 : s2 + 32], "big"
                        )
                    else:
                        timescale = duration = 0
                else:
                    timescale = int.from_bytes(content[s2 + 12 : s2 + 16], "big")
                    duration = int.from_bytes(content[s2 + 16 : s2 + 20], "big")
                if timescale:
                    duration_s = duration / timescale
            elif b2 == b"trak":
                n_tracks += 1
                for b3, s3, e3 in boxes(content, s2, e2):
                    if b3 == b"tkhd" and e3 - s3 >= 84:
                        # width/height: 16.16 fixed point at the tail
                        w = int.from_bytes(content[e3 - 8 : e3 - 4], "big") >> 16
                        h = int.from_bytes(content[e3 - 4 : e3], "big") >> 16
                        if w and h:
                            width, height = w, h
    return duration_s, width, height, major, n_tracks
