"""Pure-Python GIF decoder (stdlib only) — closes the last real
pixel-decode gap in the multimodal lane (reference tile decode
analogue: `dataset_classes_v1.py:60-61`; PNG and JPEG live in
`multimodal.decode_png_pixels` / `operators/jpeg.py`).

Scope: GIF87a/GIF89a, global or local color table, the FIRST image
frame (animation frames beyond the first are ignored for the
mean-intensity statistic), interlaced or not (interlacing permutes
ROW order, which a mean over all pixels is invariant to — rows are
still decoded through the same LZW stream). Transparent pixels (GCE
transparency index) count like any other palette entry; the stub
fallback in `multimodal._decode` remains for anything malformed.

The LZW decode follows the GIF89a specification: variable-width
codes starting at `min_code_size + 1`, a clear code resetting the
dictionary, growth to 12-bit codes, and the standard KwKwK case for
a code one past the dictionary end.
"""

from __future__ import annotations


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray | None:
    """Decode an LZW-compressed GIF index stream; None on corruption."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    # dictionary: code -> byte string of palette indices
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                # stream ended without the end code: accept what we
                # have only if the full frame was produced
                return out if len(out) >= max_pixels else None
            acc |= data[pos] << nbits  # GIF packs codes LSB-first
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out if len(out) >= max_pixels else None
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            return None  # corrupt code
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            # width growth: mirrors the reference encoders' post-write
            # check — the code that FILLS slot 1<<cs is still written
            # at the old width; only subsequent codes widen (giflib's
            # RunningCode > MaxCode1 rule lands on the same boundary)
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
        if len(out) >= max_pixels:
            return out


def decode_gif_pixels(content: bytes) -> tuple[int, int, float] | None:
    """REAL (width, height, mean_intensity∈[0,1]) from a GIF payload —
    first frame, mean over the palette RGB channels of every pixel.
    Returns None for malformed/truncated data so callers fall back."""
    try:
        return _decode_gif(content)
    except (IndexError, ValueError, MemoryError, OverflowError):
        return None


def _decode_gif(content: bytes):
    if len(content) < 13 or content[:4] != b"GIF8" or content[4:6] not in (b"7a", b"9a"):
        return None
    sw = int.from_bytes(content[6:8], "little")
    sh = int.from_bytes(content[8:10], "little")
    if not sw or not sh or sw * sh > (1 << 24):
        return None
    packed = content[10]
    i = 13
    gct: bytes | None = None
    if packed & 0x80:
        size = 3 * (2 << (packed & 0x07))
        gct = content[i : i + size]
        if len(gct) < size:
            return None
        i += size
    n = len(content)
    while i < n:
        b = content[i]
        if b == 0x3B:  # trailer
            return None  # no image frame seen
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < n and content[i] != 0:
                i += 1 + content[i]
            i += 1  # block terminator
            continue
        if b != 0x2C:  # not an image descriptor: malformed
            return None
        # image descriptor
        if i + 10 > n:
            return None
        fw = int.from_bytes(content[i + 5 : i + 7], "little")
        fh = int.from_bytes(content[i + 7 : i + 9], "little")
        fpacked = content[i + 9]
        i += 10
        palette = gct
        if fpacked & 0x80:  # local color table
            size = 3 * (2 << (fpacked & 0x07))
            palette = content[i : i + size]
            if len(palette) < size:
                return None
            i += size
        if palette is None or not fw or not fh or fw * fh > (1 << 24):
            return None
        if i >= n:
            return None
        min_code_size = content[i]
        i += 1
        # spec cap is 8 (palette bits); 9+ would also overflow the
        # byte-string base table in _lzw_decode
        if not 2 <= min_code_size <= 8:
            return None
        # concatenate data sub-blocks
        data = bytearray()
        while i < n and content[i] != 0:
            ln = content[i]
            chunk = content[i + 1 : i + 1 + ln]
            if len(chunk) < ln:
                return None
            data += chunk
            i += 1 + ln
        npix = fw * fh
        idx = _lzw_decode(min_code_size, bytes(data), npix)
        if idx is None or len(idx) < npix:
            return None
        max_entry = 3 * max(idx[:npix]) + 2
        if max_entry >= len(palette):
            return None
        total = 0
        for v in idx[:npix]:
            base = 3 * v
            total += palette[base] + palette[base + 1] + palette[base + 2]
        # dimensions reported are the logical screen (container
        # metadata, same as parse_image_header); intensity is the
        # first frame's pixel mean
        return sw, sh, total / (3 * npix) / 255.0
    return None
