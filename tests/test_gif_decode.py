"""GIF decoder correctness.

Strategy mirrors test_jpeg_decode: an independent minimal ENCODER
here (classic compress()-style LZW with the post-write width check)
produces spec-compliant GIFs from known index arrays; plus one
HAND-COMPUTED byte fixture (codes packed on paper, no code in the
loop) pins the bit-level convention; hypothesis fuzzes round-trips
and truncations.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from patientdataintegration_spark.operators.gif import decode_gif_pixels


# ---------------------------------------------------------------- encoder ---


class _LSBWriter:
    """LSB-first bit packer (GIF convention — opposite of JPEG)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        self.acc |= value << self.n
        self.n += nbits
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """Classic GIF LZW compress: emit clear, build the string table,
    post-write width growth (the ppmtogif/compress convention)."""
    clear = 1 << min_code_size
    end = clear + 1
    bits = min_code_size + 1
    bw = _LSBWriter()
    bw.write(clear, bits)
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1

    def emit(code: int):
        nonlocal bits, next_code
        bw.write(code, bits)
        if next_code > (1 << bits) - 1 and bits < 12:
            bits += 1

    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        else:
            # table full: clear and restart (keeps widths in sync)
            bw.write(clear, bits)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            bits = min_code_size + 1
        w = bytes([k])
    if w:
        emit(table[w])
    bw.write(end, bits)
    return bw.flush()


def encode_gif(width, height, palette_rgb, indices, min_code_size=None):
    """Minimal single-frame GIF89a with a global color table."""
    n_colors = len(palette_rgb)
    size_exp = max(1, (max(n_colors, 2) - 1).bit_length())  # 2^size_exp >= n
    if min_code_size is None:
        min_code_size = max(2, size_exp)
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | (size_exp - 1), 0, 0])  # GCT flag + size
    table_entries = 2 << (size_exp - 1)
    for i in range(table_entries):
        out += bytes(palette_rgb[i] if i < n_colors else (0, 0, 0))
    out += b"\x2c" + (0).to_bytes(2, "little") * 2
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0])  # no LCT, not interlaced
    out += bytes([min_code_size])
    data = lzw_encode(min_code_size, indices)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ----------------------------------------------------------------- tests ---


def test_hand_packed_fixture():
    """2x2, 4 colors, pixels [0,1,2,3]: the LZW codes were packed on
    paper (clear,0,1,2 at 3 bits; 3,end at 4 bits; LSB-first) giving
    the exact bytes 44 34 05 — pins the bit convention independently
    of any encoder code."""
    palette = bytes([0, 0, 0, 60, 60, 60, 120, 120, 120, 255, 255, 255])
    gif = (
        b"GIF89a"
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0x81, 0, 0])  # GCT present, 4 entries
        + palette
        + b"\x2c" + b"\x00\x00\x00\x00"
        + (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + bytes([0])
        + bytes([2])  # min code size
        + bytes([3, 0x44, 0x34, 0x05])
        + b"\x00\x3b"
    )
    got = decode_gif_pixels(gif)
    assert got is not None
    w, h, mean = got
    assert (w, h) == (2, 2)
    expect = (0 + 60 + 120 + 255) * 3 / 12 / 255.0
    assert abs(mean - expect) < 1e-12


def test_encoder_roundtrip_patterns():
    for w, h, ncol in [(7, 5, 4), (16, 16, 8), (33, 9, 16), (64, 64, 256)]:
        palette = [((i * 37) % 256, (i * 71) % 256, (i * 13) % 256) for i in range(ncol)]
        idx = [((x * 3 + y * 7 + x * y) % ncol) for y in range(h) for x in range(w)]
        gif = encode_gif(w, h, palette, idx)
        got = decode_gif_pixels(gif)
        assert got is not None, (w, h, ncol)
        gw, gh, mean = got
        assert (gw, gh) == (w, h)
        expect = sum(sum(palette[i]) for i in idx) / (3 * len(idx)) / 255.0
        assert abs(mean - expect) < 1e-12, (w, h, ncol)


def test_long_runs_exercise_table_growth():
    """A large image with long runs + structure pushes the string
    table through several width growths."""
    ncol = 4
    palette = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = []
    for i in range(200 * 50):
        idx.append((i // 97) % ncol if i % 13 else (i % ncol))
    gif = encode_gif(200, 50, palette, idx)
    got = decode_gif_pixels(gif)
    assert got is not None
    expect = sum(sum(palette[i]) for i in idx) / (3 * len(idx)) / 255.0
    assert abs(got[2] - expect) < 1e-12


def test_extension_blocks_are_skipped():
    """GCE/comment extensions before the image descriptor are walked
    over; decode still reaches the frame."""
    palette = [(10, 10, 10), (200, 200, 200)]
    base = encode_gif(4, 4, palette, [0, 1] * 8)
    head, rest = base[:13], base[13:]
    gct = rest[:6]
    body = rest[6:]
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    gif = head + gct + gce + comment + body
    got = decode_gif_pixels(gif)
    assert got is not None
    expect = (10 * 3 + 200 * 3) * 8 / (3 * 16) / 255.0
    assert abs(got[2] - expect) < 1e-12


def test_malformed_and_truncated_return_none():
    palette = [(0, 0, 0), (255, 255, 255)]
    gif = encode_gif(8, 8, palette, [i % 2 for i in range(64)])
    assert decode_gif_pixels(gif) is not None
    assert decode_gif_pixels(b"") is None
    assert decode_gif_pixels(b"GIF89a") is None
    assert decode_gif_pixels(gif[:20]) is None
    for cut in (3, 7, 12):
        assert decode_gif_pixels(gif[: len(gif) - cut]) is None


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 10_000),
)
def test_fuzz_roundtrip(w, h, seed):
    ncol = 2 + seed % 15
    palette = [
        (((seed + i * 31) % 256), ((seed * 7 + i * 3) % 256), ((i * 91) % 256))
        for i in range(ncol)
    ]
    idx = [((seed + x * y + x + 2 * y) % ncol) for y in range(h) for x in range(w)]
    gif = encode_gif(w, h, palette, idx)
    got = decode_gif_pixels(gif)
    assert got is not None
    assert (got[0], got[1]) == (w, h)
    expect = sum(sum(palette[i]) for i in idx) / (3 * len(idx)) / 255.0
    assert abs(got[2] - expect) < 1e-12


def test_gif_through_image_features(spark):
    """End-to-end: a real GIF rides the mapInPandas lane with
    decode_status 'real' and the true mean."""
    from patientdataintegration_spark.operators.multimodal import image_features

    palette = [(0, 0, 0), (255, 255, 255)]
    gif = encode_gif(6, 2, palette, [0, 1] * 6)
    df = spark.createDataFrame(
        [("g.gif", bytearray(gif))], "path string, content binary"
    )
    r = image_features(df).collect()[0]
    assert (r.width, r.height) == (6, 2)
    assert r.decode_status == "real"
    assert abs(r.mean_intensity - 0.5) < 1e-12
