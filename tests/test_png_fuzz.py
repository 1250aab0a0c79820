"""PNG decoder fuzz: an independent encoder (explicit filter choice
per scanline, every color type, optional Adam7 interlacing) round-
trips through `decode_png_pixels`; the expected mean is computed
directly from the pixel arrays."""

from __future__ import annotations

import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from patientdataintegration_spark.operators.multimodal import decode_png_pixels

_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _chunk(cid: bytes, body: bytes) -> bytes:
    return len(body).to_bytes(4, "big") + cid + body + b"\x00" * 4


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _filter_line(ftype: int, line: bytes, prev: bytes, channels: int) -> bytes:
    out = bytearray()
    for x, v in enumerate(line):
        a = line[x - channels] if x >= channels else 0
        b = prev[x]
        c = prev[x - channels] if x >= channels else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            pred = _paeth(a, b, c)
        out.append((v - pred) & 0xFF)
    return bytes(out)


def encode_png(width, height, color_type, samples, palette=None,
               filters=None, interlace=0):
    """samples: h rows of w*channels bytes (or palette indices)."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = bytearray()

    def emit(rows, w):
        stride = w * channels
        prev = bytes(stride)
        for yi, r in enumerate(rows):
            ftype = filters[yi % len(filters)] if filters else 0
            line = bytes(r)
            raw.append(ftype)
            raw.extend(_filter_line(ftype, line, prev, channels))
            prev = line

    if interlace == 0:
        emit(samples, width)
    else:
        for x0, y0, dx, dy in _ADAM7:
            rows = []
            for y in range(y0, height, dy):
                r = []
                for x in range(x0, width, dx):
                    r.extend(samples[y][x * channels : (x + 1) * channels])
                rows.append(r)
            rows = [r for r in rows if r]
            if rows:
                emit(rows, (width - x0 + dx - 1) // dx)
    ihdr = (
        width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, interlace])
    )
    png = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        png += _chunk(b"PLTE", bytes(palette))
    png += _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    return png


def _expected_mean(color_type, samples, palette, width):
    total = n = 0
    for row in samples:
        if color_type == 3:
            for v in row:
                total += palette[3 * v] + palette[3 * v + 1] + palette[3 * v + 2]
                n += 3
        elif color_type in (0, 2):
            total += sum(row)
            n += len(row)
        elif color_type == 4:
            total += sum(row[0::2])
            n += len(row) // 2
        else:  # RGBA
            for x in range(0, len(row), 4):
                total += row[x] + row[x + 1] + row[x + 2]
            n += 3 * (len(row) // 4)
    return total / n / 255.0


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    color_type=st.sampled_from([0, 2, 3, 4, 6]),
    seed=st.integers(0, 100_000),
    interlace=st.sampled_from([0, 1]),
)
def test_fuzz_roundtrip_all_color_types(w, h, color_type, seed, interlace):
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    palette = None
    if color_type == 3:
        ncol = 2 + seed % 30
        palette = bytes(
            ((seed + i * j * 37) % 256) for i in range(ncol) for j in (1, 2, 3)
        )
        samples = [
            [((seed + x * y + 3 * x + y) % ncol) for x in range(w)]
            for y in range(h)
        ]
    else:
        samples = [
            [((seed + x * 7 + y * 13 + c * 29 + x * y) % 256)
             for x in range(w) for c in range(channels)]
            for y in range(h)
        ]
    filters = [(seed + k) % 5 for k in range(4)]  # cycles through types
    png = encode_png(w, h, color_type, samples, palette, filters, interlace)
    got = decode_png_pixels(png)
    assert got is not None, (w, h, color_type, interlace)
    assert (got[0], got[1]) == (w, h)
    expect = _expected_mean(color_type, samples, palette, w)
    assert abs(got[2] - expect) < 1e-12


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(2, 12),
    h=st.integers(2, 12),
    seed=st.integers(0, 10_000),
    cut=st.integers(1, 60),
)
def test_fuzz_truncated_idat_declines(w, h, seed, cut):
    samples = [
        [((seed + x * 3 + y * 5) % 256) for x in range(w)] for y in range(h)
    ]
    png = encode_png(w, h, 0, samples, None, [4], 0)
    # truncate the DEFLATE payload inside the IDAT chunk and re-chunk
    sig_ihdr = png[: 8 + 12 + 13]
    idat_body_len = int.from_bytes(png[8 + 25 : 8 + 29], "big")
    body = png[8 + 25 + 8 : 8 + 25 + 8 + idat_body_len]
    short = body[: max(0, len(body) - cut)]
    bad = sig_ihdr + _chunk(b"IDAT", short) + _chunk(b"IEND", b"")
    assert decode_png_pixels(bad) is None


def encode_png16(width, height, color_type, samples16, filters=None, interlace=0):
    """16-bit variant: samples16 rows hold w*channels 16-bit values;
    filtering is bytewise at distance channels*2 per the spec."""
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    bpp = channels * 2
    raw = bytearray()

    def to_bytes_row(r):
        out = bytearray()
        for v in r:
            out += v.to_bytes(2, "big")
        return bytes(out)

    def emit(rows):
        if not rows or not rows[0]:
            return
        stride = len(rows[0]) * 2
        prev = bytes(stride)
        for yi, r in enumerate(rows):
            ftype = filters[yi % len(filters)] if filters else 0
            line = to_bytes_row(r)
            raw.append(ftype)
            raw.extend(_filter_line(ftype, line, prev, bpp))
            prev = line

    if interlace == 0:
        emit(samples16)
    else:
        for x0, y0, dx, dy in _ADAM7:
            rows = []
            for y in range(y0, height, dy):
                r = []
                for x in range(x0, width, dx):
                    r.extend(samples16[y][x * channels : (x + 1) * channels])
                if r:
                    rows.append(r)
            emit(rows)
    ihdr = (
        width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + bytes([16, color_type, 0, 0, interlace])
    )
    return (
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    )


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 14),
    h=st.integers(1, 14),
    color_type=st.sampled_from([0, 2, 4, 6]),
    seed=st.integers(0, 100_000),
    interlace=st.sampled_from([0, 1]),
)
def test_fuzz_16bit_roundtrip(w, h, color_type, seed, interlace):
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    samples = [
        [((seed * 131 + x * 977 + y * 4099 + c * 31 + x * y) % 65536)
         for x in range(w) for c in range(channels)]
        for y in range(h)
    ]
    filters = [(seed + k) % 5 for k in range(3)]
    png = encode_png16(w, h, color_type, samples, filters, interlace)
    got = decode_png_pixels(png)
    assert got is not None, (w, h, color_type, interlace)
    assert (got[0], got[1]) == (w, h)
    total = n = 0
    for row in samples:
        for i, v in enumerate(row):
            ch = i % channels
            if (color_type == 4 and ch == 1) or (color_type == 6 and ch == 3):
                continue
            total += v
            n += 1
    assert abs(got[2] - total / n / 65535.0) < 1e-12
