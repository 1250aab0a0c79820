"""Pure-Python baseline JPEG decoder (stdlib only).

Closes the multimodal lane's last stub: tile payloads in the
reference are JPEG (`dataset_classes_v1.py:60-61`), and this
container has no image libraries — so the engine carries its own
minimal decoder for the sequential baseline process (the profile
every camera/tile pipeline emits): DQT/DHT/SOF0/SOS marker parse,
huffman entropy decode with byte-unstuffing and restart markers,
dequantize + dezigzag, separable float IDCT, chroma upsampling and
YCbCr→RGB. Progressive (SOF2, huffman) decodes too — spectral
selection + successive approximation with per-block coefficient
state across scans (`decode_progressive_jpeg`, bottom of file).
Arithmetic coding and 12-bit precision are out of scope and return
None so callers fall back.

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

try:  # the batched-IDCT/assembly fast path; scalar fallback without
    import numpy as _np
except ImportError:  # pragma: no cover
    _np = None

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


def _idct_blocks(coeff_blocks):
    """Batched 8x8 IDCT over a whole component grid (r15 verdict
    item 7): one numpy pass instead of a per-block Python loop,
    BIT-IDENTICAL to `_idct_block` — each matrix pass accumulates in
    the same v-then-u left-to-right order as the scalar fold
    (elementwise IEEE adds commute with batching, not with
    reordering, so the fold order is preserved explicitly), and
    rounding is `np.rint` (half-even — Python `round`'s rule). The
    only representable divergence is the sign of intermediate zeros,
    which cannot change a rounded-and-clamped integer pixel.
    `None` entries (blocks a truncated scan never produced) pass
    through as `None`. Falls back to the scalar reference when numpy
    is unavailable."""
    if _np is None:
        return [b if b is None else _idct_block(b) for b in coeff_blocks]
    idx = [i for i, b in enumerate(coeff_blocks) if b is not None]
    if not idx:
        return list(coeff_blocks)
    C = _np.array(
        [coeff_blocks[i] for i in idx], dtype=_np.float64
    ).reshape(len(idx), 8, 8)
    A = _np.array(_IDCT_A, dtype=_np.float64)  # A[y][v]
    tmp = _np.zeros_like(C)  # tmp[b, u, y]
    for v in range(8):
        tmp += C[:, :, v, None] * A[None, None, :, v]
    res = _np.zeros_like(C)  # res[b, x, y]
    for u in range(8):
        res += tmp[:, u, None, :] * A[None, :, u, None]
    vals = _np.clip(_np.rint(res).astype(_np.int64) + 128, 0, 255)
    flat = vals.reshape(len(idx), 64)
    out = list(coeff_blocks)
    for row, i in enumerate(idx):
        out[i] = [int(x) for x in flat[row]]
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
            if ncomp > 4:
                return None  # hostile-header allocation bound (see SOF2)
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
                        # defer the IDCT: store dequantized
                        # coefficients, transform the whole grid in
                        # one batched pass after the entropy decode
                        bw = mcus_x * hs
                        grids[comp_idx][(my * vs + by) * bw + (mx * hs + bx)] = coeffs
            mcu_count += 1

    pixel_grids = [_idct_blocks(g) for g in grids]
    return w, h, len(comps), _assemble_planes(
        w, h, comps, hmax, vmax, mcus_x, pixel_grids
    )


def _assemble_planes(w, h, comps, hmax, vmax, mcus_x, grids):
    """Full-resolution per-component planes from per-component grids
    of decoded 8x8 pixel blocks (nearest-neighbour chroma
    upsampling). The numpy path is a pure-integer gather — tile the
    block grid into a 2D component image, then index it with the
    y//sy, x//sx upsampling maps — and therefore exactly the scalar
    loop's bytes; the scalar loop remains as the no-numpy fallback."""
    planes = []
    for ci, (_, hs, vs, _) in enumerate(comps):
        bw = mcus_x * hs
        sx = hmax // hs  # integer subsampling ratios (1 or 2 or 4)
        sy = vmax // vs
        grid = grids[ci]
        if _np is not None:
            bh = len(grid) // bw
            blocks = _np.zeros((bh * bw, 64), dtype=_np.int64)
            for i, b in enumerate(grid):
                if b:
                    blocks[i] = b
            img = (
                blocks.reshape(bh, bw, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(bh * 8, bw * 8)
            )
            cy = _np.arange(h) // sy
            cx = _np.arange(w) // sx
            plane = bytearray(
                img[cy[:, None], cx[None, :]].astype(_np.uint8).tobytes()
            )
            planes.append(plane)
            continue
        plane = bytearray(w * h)
        for y in range(h):
            cy0 = y // sy
            brow, py = cy0 >> 3, cy0 & 7
            row_base = y * w
            for x in range(w):
                cx0 = x // sx
                block = grid[brow * bw + (cx0 >> 3)]
                plane[row_base + x] = block[py * 8 + (cx0 & 7)] if block else 0
        planes.append(plane)
    return planes


def decode_jpeg_pixels(content: bytes):
    """(width, height, mean_intensity∈[0,1]) from a baseline OR
    progressive JPEG — mean over RGB channels after YCbCr conversion
    (grayscale: mean luma), matching `decode_png_pixels` semantics.
    None if not decodable."""
    decoded = decode_baseline_jpeg(content)
    if decoded is None:
        decoded = decode_progressive_jpeg(content)
    if decoded is None:
        return None
    w, h, ncomp, planes = decoded
    npix = w * h
    if ncomp == 1:
        return w, h, sum(planes[0]) / npix / 255.0
    if ncomp != 3:
        return None
    Y, Cb, Cr = planes
    if _np is not None:
        # elementwise ops are the scalar expressions verbatim (same
        # IEEE ops on the same doubles); only the total's ADD ORDER
        # differs (numpy pairwise vs the fallback's sequential fold),
        # so the two paths can differ in the mean's last ulp — and a
        # ulp sitting exactly on a rounding boundary would survive the
        # suite's round-to-N-dp discipline (r16 ADVICE). numpy
        # availability is therefore PART OF THE PINNED ENVIRONMENT
        # for the decode lanes: the hash-oracled expected values were
        # produced with numpy present, and the scalar path below is a
        # correctness fallback for numpy-free deployments, not a
        # hash-equivalent twin.
        y = _np.frombuffer(bytes(Y), dtype=_np.uint8).astype(_np.float64)
        cb = _np.frombuffer(bytes(Cb), dtype=_np.uint8).astype(_np.float64) - 128.0
        cr = _np.frombuffer(bytes(Cr), dtype=_np.uint8).astype(_np.float64) - 128.0
        r = _np.clip(y + 1.402 * cr, 0.0, 255.0)
        g = _np.clip(y - 0.344136 * cb - 0.714136 * cr, 0.0, 255.0)
        b = _np.clip(y + 1.772 * cb, 0.0, 255.0)
        total = float(_np.sum(r) + _np.sum(g) + _np.sum(b))
        return w, h, total / (3 * npix) / 255.0
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


# ------------------------------------------------------------ progressive ---
#
# Progressive JPEG (SOF2, huffman): the image is sent as a SEQUENCE of
# scans, each covering one spectral band (Ss..Se) of one-or-all
# components at one bit of successive approximation (Ah → Al). The
# decoder therefore keeps per-block COEFFICIENT state across scans and
# only dequantizes + IDCTs once, after the last scan:
#
#   DC first scan    (Ss=Se=0, Ah=0): huffman DIFF decode, value << Al
#   DC refinement    (Ss=Se=0, Ah>0): one appended bit per block (|= 1<<Al)
#   AC first scans   (Ss>0, Ah=0):    RS decode within the band, plus
#                                     EOBn run-length codes (EOBRUN)
#   AC refinements   (Ss>0, Ah>0):    correction bit per already-nonzero
#                                     coefficient; new ones enter ±1<<Al
#
# AC scans are single-component by spec; DC scans may be interleaved.
# Algorithm per ITU T.81 G.2 (the widely-documented successive-
# approximation control flow, e.g. libjpeg's jdphuff notes).


def decode_progressive_jpeg(content: bytes):
    """Decode a progressive (SOF2, huffman) JPEG.

    Same contract as `decode_baseline_jpeg`: (width, height,
    n_components, planes) or None (baseline payloads, arithmetic
    coding, 12-bit, truncated, malformed all decline)."""
    try:
        return _decode_progressive(content)
    except (IndexError, ValueError, KeyError, MemoryError, OverflowError):
        return None


def _ac_first_scan(br, ac_tab, coef, ss, se, al, eobrun):
    """One block of an Ah=0 AC scan; returns the remaining EOBRUN."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(br, ac_tab)
        if rs is None:
            raise ValueError("bad AC symbol")
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            eobrun = 1 << r
            if r:
                eobrun += br.read_bits(r)
            return eobrun - 1  # current block is part of the run
        k += r
        if k > se:
            raise ValueError("AC run past band")
        coef[ZIGZAG[k]] = _extend(br.read_bits(s), s) * (1 << al)
        k += 1
    return 0


def _ac_refine_scan(br, ac_tab, coef, ss, se, al, eobrun):
    """One block of an Ah>0 AC refinement scan; returns EOBRUN.

    Correction bits interleave with the run structure: every already-
    nonzero coefficient passed over (including during EOB runs and
    ZRLs) reads one bit that may add ±1<<Al toward larger magnitude."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(br, ac_tab)
            if rs is None:
                raise ValueError("bad AC symbol")
            r, s = rs >> 4, rs & 0x0F
            s_val = 0
            if s:
                if s != 1:
                    raise ValueError("refinement size must be 1")
                s_val = p1 if br.read_bit() else -p1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.read_bits(r)
                break  # remaining coefficients handled in EOBRUN sweep
            # advance over r zero-history coefficients, correcting
            # nonzero-history ones along the way
            while k <= se:
                pos = ZIGZAG[k]
                if coef[pos] != 0:
                    if br.read_bit() and not (coef[pos] & p1):
                        coef[pos] += p1 if coef[pos] >= 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s_val and k <= se:
                coef[ZIGZAG[k]] = s_val
            k += 1
    if eobrun > 0:
        while k <= se:
            pos = ZIGZAG[k]
            if coef[pos] != 0:
                if br.read_bit() and not (coef[pos] & p1):
                    coef[pos] += p1 if coef[pos] >= 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(content: bytes):
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        return None
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (w, h, [(cid, hs, vs, tq)])
    grids = None  # per-comp full-grid coefficient lists (natural order)
    geom = None  # (hmax, vmax, mcus_x, mcus_y)
    n_scans = 0

    i, n = 2, len(content)
    while i + 3 < n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD8:
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = int.from_bytes(content[i + 2 : i + 4], "big")
        body = content[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT (same syntax as baseline)
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
        elif marker == 0xC4:  # DHT — tables may be redefined between scans
            j = 0
            while j + 17 <= len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                huff[(tc, th)] = _build_huffman(bits, body[j + 17 : j + 17 + nv])
                j += 17 + nv
        elif marker == 0xC2:  # SOF2: progressive huffman
            if body[0] != 8:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if body[5] > 4:
                # JFIF/EXIF images carry <= 4 components; a hostile
                # header declaring up to 255 would multiply the
                # coefficient-grid allocation below past any w*h bound
                return None
            comps = []
            for c in range(body[5]):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * c]))
            if not w or not h or w * h > (1 << 24):
                return None
            frame = (w, h, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            geom = (hmax, vmax, mcus_x, mcus_y)
            grids = [
                [[0] * 64 for _ in range(mcus_x * hs * mcus_y * vs)]
                for _, hs, vs, _ in comps
            ]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # baseline/other processes: not this decoder
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — run one scan, continue after it
            if frame is None:
                return None
            n_scans += 1
            if n_scans > 64:
                return None  # hostile scan-count bound
            w, h, comps = frame
            ns = body[0]
            sel = []
            for s in range(ns):
                cs = body[1 + 2 * s]
                tt = body[2 + 2 * s]
                idx = next((k for k, c in enumerate(comps) if c[0] == cs), None)
                if idx is None:
                    return None
                sel.append((idx, tt >> 4, tt & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            # band validity (T.81 G.1.1.1.1): DC scans are exactly
            # Ss=Se=0; AC scans (Ss>=1) are single-component only —
            # anything else would misparse the entropy stream with
            # the wrong table and return garbage as a 'real' decode
            if se > 63 or ss > se or (ss == 0 and se != 0):
                return None
            if ns > 1 and (ss != 0 or se != 0):
                return None
            end = _run_progressive_scan(
                content, i + 2 + seg_len, frame, geom, sel,
                ss, se, ah, al, huff, restart_interval, grids,
            )
            i = end
            continue
        i += 2 + seg_len

    if frame is None or grids is None or n_scans == 0 or not quant:
        return None
    w, h, comps = frame
    hmax, vmax, mcus_x, _ = geom
    pixel_grids = []
    for ci, (_, hs, vs, tq) in enumerate(comps):
        q = quant.get(tq)
        if q is None:
            return None
        blocks = []
        for coef in grids[ci]:
            dq = [0.0] * 64
            for k in range(64):
                c = coef[ZIGZAG[k]]
                if c:
                    dq[ZIGZAG[k]] = c * q[k]
            blocks.append(dq)
        pixel_grids.append(_idct_blocks(blocks))
    return w, h, len(comps), _assemble_planes(
        w, h, comps, hmax, vmax, mcus_x, pixel_grids
    )


def _run_progressive_scan(
    content, data_start, frame, geom, sel, ss, se, ah, al,
    huff, restart_interval, grids,
):
    """Execute one scan's entropy data; returns the byte offset just
    past the consumed entropy segment (next marker search resumes
    there). Raises ValueError on malformed/truncated data."""
    w, h, comps = frame
    hmax, vmax, mcus_x, mcus_y = geom
    br = _BitReader(content, data_start)
    eobrun = 0

    if len(sel) > 1:
        # interleaved: DC band only (enforced by caller)
        pred = [0] * len(comps)
        mcu_count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    if not br.sync_restart():
                        raise ValueError("missing restart")
                    pred = [0] * len(comps)
                    eobrun = 0
                for comp_idx, dc_id, _ac_id in sel:
                    _, hs, vs, _ = comps[comp_idx]
                    bw = mcus_x * hs
                    tab = huff.get((0, dc_id)) if ah == 0 else None
                    if ah == 0 and tab is None:
                        raise ValueError("missing DC table")
                    for by in range(vs):
                        for bx in range(hs):
                            coef = grids[comp_idx][(my * vs + by) * bw + (mx * hs + bx)]
                            if ah == 0:
                                t = _decode_symbol(br, tab)
                                if t is None:
                                    raise ValueError("bad DC symbol")
                                diff = _extend(br.read_bits(t), t) if t else 0
                                pred[comp_idx] += diff
                                coef[0] = pred[comp_idx] * (1 << al)
                            elif br.read_bit():
                                coef[0] |= 1 << al
                mcu_count += 1
    else:
        comp_idx, dc_id, ac_id = sel[0]
        _, hs, vs, _ = comps[comp_idx]
        # non-interleaved: the component's OWN block grid (ceil of its
        # scaled dimensions), stored into the full interleaved-stride grid
        cw = -(-(w * hs) // hmax)
        ch = -(-(h * vs) // vmax)
        bw_ni, bh_ni = -(-cw // 8), -(-ch // 8)
        bw_full = mcus_x * hs
        grid = grids[comp_idx]
        if ss == 0:
            tab = huff.get((0, dc_id)) if ah == 0 else None
            if ah == 0 and tab is None:
                raise ValueError("missing DC table")
        else:
            tab = huff.get((1, ac_id))
            if tab is None:
                raise ValueError("missing AC table")
        pred0 = 0
        blk = 0
        for byi in range(bh_ni):
            for bxi in range(bw_ni):
                if restart_interval and blk and blk % restart_interval == 0:
                    if not br.sync_restart():
                        raise ValueError("missing restart")
                    pred0 = 0
                    eobrun = 0
                coef = grid[byi * bw_full + bxi]
                if ss == 0:
                    if ah == 0:
                        t = _decode_symbol(br, tab)
                        if t is None:
                            raise ValueError("bad DC symbol")
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred0 += diff
                        coef[0] = pred0 * (1 << al)
                    elif br.read_bit():
                        coef[0] |= 1 << al
                elif ah == 0:
                    eobrun = _ac_first_scan(br, tab, coef, ss, se, al, eobrun)
                else:
                    eobrun = _ac_refine_scan(br, tab, coef, ss, se, al, eobrun)
                blk += 1
    if br.exhausted:
        raise ValueError("truncated entropy stream")
    return max(br.pos, data_start)
