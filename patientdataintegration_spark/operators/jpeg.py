"""Pure-Python baseline JPEG decoder (stdlib only).

Closes the multimodal lane's last stub: tile payloads in the
reference are JPEG (`dataset_classes_v1.py:60-61`), and this
container has no image libraries — so the engine carries its own
minimal decoder for the sequential baseline process (the profile
every camera/tile pipeline emits): DQT/DHT/SOF0/SOS marker parse,
huffman entropy decode with byte-unstuffing and restart markers,
dequantize + dezigzag, separable float IDCT, chroma upsampling and
YCbCr→RGB. Progressive (SOF2), arithmetic coding and 12-bit
precision are out of scope and return None so callers fall back.

This is the slow path by construction (pure Python, ~1 ms per small
tile): it runs inside the Arrow-batched `mapInPandas` lane where a
production build swaps in PIL/torchvision behind the same contract.
Correctness is pinned by tests that ENCODE known pixel blocks with
an independent minimal encoder and by analytic DC-only cases
(a block with only a DC coefficient must decode to the flat value
round(DC·q/8)+128 exactly).
"""

from __future__ import annotations

import math

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# A[x][u] = C(u)/2 * cos((2x+1)uπ/16) — the separable IDCT basis
_IDCT_A = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16.0)
        for u in range(8)
    ]
    for x in range(8)
]


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; restart markers are consumed by `sync_restart`."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        # sticky: set once a read consumes bits past the real data; a
        # well-formed stream never needs past-end bits, so any decode
        # that tripped this produced garbage and must return None
        self.exhausted = False

    def _fill(self) -> bool:
        d, n = self.data, len(self.data)
        while self.nbits <= 24:
            if self.pos >= n:
                break
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < n else None
                if nxt != 0x00:
                    break  # restart marker / EOI / next segment
                self.pos += 2  # stuffed FF00 → literal 0xFF byte
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        return self.nbits > 0

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            self.exhausted = True
            return 0  # past-end bits read as 0
        if self.nbits == 0:
            self.exhausted = True
            return 0
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> bool:
        """Byte-align and consume one RSTn marker; False if absent."""
        self.acc = 0
        self.nbits = 0
        d, n = self.data, len(self.data)
        while self.pos + 1 < n and d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
            self.pos += 1
        if self.pos + 1 < n and d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return True
        return False


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """(code_length, code) → symbol, per the canonical construction
    (JPEG Annex C): codes of each length are consecutive."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int | None:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (JPEG F.2.2.1 EXTEND)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _idct_block(coeffs: list[float]) -> list[int]:
    """8x8 separable IDCT + level shift + clamp → 64 pixel values."""
    A = _IDCT_A
    # rows: tmp[u][y] = Σ_v F[u][v]·A[y][v]
    tmp = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        base = u * 8
        row = coeffs[base : base + 8]
        if not any(row):
            continue
        for y in range(8):
            Ay = A[y]
            tmp[u][y] = (
                row[0] * Ay[0] + row[1] * Ay[1] + row[2] * Ay[2] + row[3] * Ay[3]
                + row[4] * Ay[4] + row[5] * Ay[5] + row[6] * Ay[6] + row[7] * Ay[7]
            )
    out = [0] * 64
    for x in range(8):
        Ax = A[x]
        for y in range(8):
            s = (
                tmp[0][y] * Ax[0] + tmp[1][y] * Ax[1] + tmp[2][y] * Ax[2]
                + tmp[3][y] * Ax[3] + tmp[4][y] * Ax[4] + tmp[5][y] * Ax[5]
                + tmp[6][y] * Ax[6] + tmp[7][y] * Ax[7]
            )
            v = int(round(s)) + 128
            out[x * 8 + y] = 0 if v < 0 else (255 if v > 255 else v)
    return out


def decode_baseline_jpeg(content: bytes):
    """Decode a baseline sequential JPEG.

    Returns (width, height, n_components, planes) with `planes` a
    list of per-component bytearrays at FULL image resolution
    (chroma nearest-upsampled), or None if the payload is not a
    decodable baseline JPEG (progressive, 12-bit, truncated,
    malformed — any of them just declines rather than raising)."""
    try:
        return _decode_baseline(content)
    except (IndexError, ValueError, KeyError, MemoryError, OverflowError):
        return None


def _decode_baseline(content: bytes):
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        return None
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (w, h, [(cid, hs, vs, tq)])
    scan = None  # ([(comp_idx, dc_id, ac_id)], data_start)

    i, n = 2, len(content)
    while i + 3 < n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
        body = content[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                j += 1
                if pq == 0:
                    quant[tq] = list(body[j : j + 64])
                    j += 64
                else:
                    quant[tq] = [
                        int.from_bytes(body[j + 2 * k : j + 2 * k + 2], "big")
                        for k in range(64)
                    ]
                    j += 128
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                vals = body[j + 17 : j + 17 + nv]
                huff[(tc, th)] = _build_huffman(bits, vals)
                j += 17 + nv
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 (baseline huffman)
            if body[0] != 8:
                return None  # 12-bit precision unsupported
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * c]))
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            sel = []
            for s in range(ns):
                cs = body[1 + 2 * s]
                tt = body[2 + 2 * s]
                idx = next(
                    (k for k, c in enumerate(frame[2]) if c[0] == cs), None
                )
                if idx is None:
                    return None
                sel.append((idx, tt >> 4, tt & 0x0F))
            scan = (sel, i + 2 + seg_len)
            break
        i += 2 + seg_len

    if frame is None or scan is None or not quant:
        return None
    w, h, comps = frame
    if not w or not h:
        return None
    if w * h > (1 << 24):
        # malformed/hostile headers can declare huge frames; a pure-
        # Python decode of >16M pixels would pin an executor core for
        # minutes — decline and let the caller fall back
        return None
    sel, data_start = scan
    if len(comps) == 1:
        # single-component frames are never interleaved: the MCU is
        # one data unit regardless of declared sampling factors
        cid, _, _, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
    elif len(sel) != len(comps):
        return None  # non-interleaved multi-scan color: out of scope
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component block grids (before upsampling)
    grids = []
    for _, hs, vs, _ in comps:
        bw, bh = mcus_x * hs, mcus_y * vs
        grids.append([None] * (bw * bh))

    br = _BitReader(content, data_start)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not br.sync_restart():
                    return None
                pred = [0] * len(comps)
            for comp_idx, dc_id, ac_id in sel:
                _, hs, vs, tq = comps[comp_idx]
                q = quant.get(tq)
                dc_tab = huff.get((0, dc_id))
                ac_tab = huff.get((1, ac_id))
                if q is None or dc_tab is None or ac_tab is None:
                    return None
                for by in range(vs):
                    for bx in range(hs):
                        coeffs = [0.0] * 64
                        t = _decode_symbol(br, dc_tab)
                        if t is None:
                            return None
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[comp_idx] += diff
                        coeffs[0] = pred[comp_idx] * q[0]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, ac_tab)
                            if rs is None:
                                return None
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            coeffs[ZIGZAG[k]] = _extend(br.read_bits(s), s) * q[k]
                            k += 1
                        if br.exhausted:
                            # truncated mid-entropy-stream: the bits
                            # just decoded were fabricated padding
                            return None
                        block = _idct_block(coeffs)
                        bw = mcus_x * hs
                        grids[comp_idx][(my * vs + by) * bw + (mx * hs + bx)] = block
            mcu_count += 1

    # assemble full-resolution planes (nearest upsampling)
    planes = []
    for ci, (_, hs, vs, _) in enumerate(comps):
        bw = mcus_x * hs
        plane = bytearray(w * h)
        sx = hmax // hs  # integer subsampling ratios (1 or 2 or 4)
        sy = vmax // vs
        grid = grids[ci]
        for y in range(h):
            cy = y // sy
            brow, py = cy >> 3, cy & 7
            row_base = y * w
            for x in range(w):
                cx = x // sx
                block = grid[brow * bw + (cx >> 3)]
                plane[row_base + x] = block[py * 8 + (cx & 7)] if block else 0
        planes.append(plane)
    return w, h, len(comps), planes


def decode_jpeg_pixels(content: bytes):
    """(width, height, mean_intensity∈[0,1]) from a baseline JPEG —
    mean over RGB channels after YCbCr conversion (grayscale: mean
    luma), matching `decode_png_pixels` semantics. None if not
    decodable baseline."""
    decoded = decode_baseline_jpeg(content)
    if decoded is None:
        return None
    w, h, ncomp, planes = decoded
    npix = w * h
    if ncomp == 1:
        return w, h, sum(planes[0]) / npix / 255.0
    if ncomp != 3:
        return None
    Y, Cb, Cr = planes
    total = 0.0
    for k in range(npix):
        y = Y[k]
        cb = Cb[k] - 128
        cr = Cr[k] - 128
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        total += (
            (0.0 if r < 0 else 255.0 if r > 255 else r)
            + (0.0 if g < 0 else 255.0 if g > 255 else g)
            + (0.0 if b < 0 else 255.0 if b > 255 else b)
        )
    return w, h, total / (3 * npix) / 255.0
