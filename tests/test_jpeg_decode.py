"""Baseline-JPEG decoder correctness.

Strategy: a minimal ENCODER here (independent code path — canonical
huffman construction from scratch, coefficient-level input so no FDCT
is needed) produces spec-compliant baseline JPEGs from known DCT
coefficient blocks; expected pixels come from an independent numpy
IDCT. Analytic DC-only cases additionally pin exact flat values with
no reference implementation in the loop at all.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from patientdataintegration_spark.operators.jpeg import (
    ZIGZAG,
    decode_baseline_jpeg,
    decode_jpeg_pixels,
)


# ---------------------------------------------------------------- encoder ---


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        for k in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)  # pad with 1s per spec
        return bytes(self.out)


def _canonical(symbols):
    """All symbols at one code length L (canonical, consecutive codes;
    the all-ones code stays unused because count < 2^L)."""
    L = max(1, math.ceil(math.log2(len(symbols) + 1)))
    bits = [0] * 16
    bits[L - 1] = len(symbols)
    codes = {sym: (L, code) for code, sym in enumerate(symbols)}
    return bits, list(symbols), codes


def _category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _value_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def encode_jpeg(width, height, comps, quant, blocks, restart_interval=0):
    """comps: [(h_samp, v_samp)] per component; quant: 64 ints
    (zigzag order), shared by all components; blocks: dict
    comp_idx -> list of 64-int coefficient lists (zigzag order,
    already UNQUANTIZED — we divide by quant here) in MCU order."""
    hmax = max(h for h, _ in comps)
    vmax = max(v for _, v in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)

    # gather the symbol alphabets actually used
    dc_syms, ac_syms = set(), set()
    qblocks = {
        ci: [[c // q if q else c for c, q in zip(b, quant)] for b in bs]
        for ci, bs in blocks.items()
    }
    for ci, bs in qblocks.items():
        # collect DC categories for both the running-diff and the
        # restart-reset (absolute) cases so the table always covers
        # whatever the writer emits
        pred = 0
        for b in bs:
            dc_syms.add(_category(b[0] - pred))
            dc_syms.add(_category(b[0]))  # reset-case diff
            pred = b[0]
            k = 1
            while k < 64:
                run = 0
                while k < 64 and b[k] == 0:
                    run += 1
                    k += 1
                if k == 64:
                    ac_syms.add(0x00)
                    break
                while run > 15:
                    ac_syms.add(0xF0)
                    run -= 16
                ac_syms.add((run << 4) | _category(b[k]))
                k += 1
            # no EOB when coefficients run through k=63 (spec F.1.2.2)
    dc_bits, dc_vals, dc_codes = _canonical(sorted(dc_syms))
    ac_bits, ac_vals, ac_codes = _canonical(sorted(ac_syms))

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(quant))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for ci, (hs, vs) in enumerate(comps):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    # entropy-coded data, fully interleaved MCU order
    bw = _BitWriter()
    pred = [0] * len(comps)
    iters = {ci: iter(bs) for ci, bs in qblocks.items()}
    body = bytearray()
    mcu_idx = 0
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                body += bw.flush()
                body += bytes([0xFF, 0xD0 + ((mcu_idx // restart_interval - 1) % 8)])
                bw = _BitWriter()
                pred = [0] * len(comps)
            for ci, (hs, vs) in enumerate(comps):
                for _ in range(hs * vs):
                    b = next(iters[ci])
                    diff = b[0] - pred[ci]
                    pred[ci] = b[0]
                    t = _category(diff)
                    L, code = dc_codes[t]
                    bw.write(code, L)
                    if t:
                        bw.write(_value_bits(diff, t), t)
                    k = 1
                    while k < 64:
                        run = 0
                        while k < 64 and b[k] == 0:
                            run += 1
                            k += 1
                        if k == 64:
                            L, code = ac_codes[0x00]
                            bw.write(code, L)
                            break
                        while run > 15:
                            L, code = ac_codes[0xF0]
                            bw.write(code, L)
                            run -= 16
                        s = _category(b[k])
                        L, code = ac_codes[(run << 4) | s]
                        bw.write(code, L)
                        bw.write(_value_bits(b[k], s), s)
                        k += 1
                    # no EOB when coefficients run through k=63
            mcu_idx += 1
    body += bw.flush()
    out += body
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------- numpy reference ---


def ref_idct(coeffs_zigzag, quant):
    """Independent IDCT: dequantize, dezigzag, numpy cosine-matrix
    IDCT, level shift, clamp — mirrors the spec, not the decoder."""
    F = np.zeros(64)
    for k in range(64):
        F[ZIGZAG[k]] = (coeffs_zigzag[k] // quant[k] if quant[k] else 0) * quant[k]
    F = F.reshape(8, 8)
    A = np.array(
        [
            [
                (1 / math.sqrt(2) if u == 0 else 1.0) / 2.0
                * math.cos((2 * x + 1) * u * math.pi / 16)
                for u in range(8)
            ]
            for x in range(8)
        ]
    )
    px = A @ F @ A.T
    return np.clip(np.round(px) + 128, 0, 255).astype(np.int64)


# ----------------------------------------------------------------- tests ---

FLAT_Q = [8] * 64


def test_dc_only_flat_block_analytic():
    """A block with only a DC coefficient decodes to the exact flat
    value round(DC·q/8)+128 — no reference implementation needed."""
    dc = 16  # dequantized DC = 128 → pixels = 128/8 + 128 = 144
    block = [dc * FLAT_Q[0]] + [0] * 63
    content = encode_jpeg(8, 8, [(1, 1)], FLAT_Q, {0: [block]})
    got = decode_baseline_jpeg(content)
    assert got is not None
    w, h, ncomp, planes = got
    assert (w, h, ncomp) == (8, 8, 1)
    assert set(planes[0]) == {144}
    mean = decode_jpeg_pixels(content)
    assert mean == (8, 8, 144 / 255.0)


def test_negative_dc_and_ac_coefficients_match_reference():
    """Two-MCU grayscale image with negative DC diffs, AC runs and a
    ZRL — decoded pixels equal the independent numpy IDCT exactly."""
    b1 = [0] * 64
    b1[0] = -24 * FLAT_Q[0]
    b1[1] = 5 * FLAT_Q[1]
    b1[7] = -3 * FLAT_Q[7]
    b2 = [0] * 64
    b2[0] = 40 * FLAT_Q[0]
    b2[20] = 7 * FLAT_Q[20]
    b2[63] = -2 * FLAT_Q[63]  # forces a long zero run (ZRL path)
    content = encode_jpeg(16, 8, [(1, 1)], FLAT_Q, {0: [b1, b2]})
    got = decode_baseline_jpeg(content)
    assert got is not None
    w, h, ncomp, planes = got
    assert (w, h, ncomp) == (16, 8, 1)
    expect = np.concatenate([ref_idct(b1, FLAT_Q), ref_idct(b2, FLAT_Q)], axis=1)
    plane = np.array(planes[0]).reshape(8, 16)
    np.testing.assert_array_equal(plane, expect)


def test_color_420_upsampling_and_rgb_mean():
    """4:2:0 color: four Y blocks + one Cb + one Cr per MCU; chroma
    nearest-upsamples; mean intensity equals the independent
    pipeline (numpy IDCT → upsample → YCbCr→RGB → mean)."""
    yb = []
    for dc in (10, -10, 30, -30):
        b = [0] * 64
        b[0] = dc * FLAT_Q[0]
        b[3] = 4 * FLAT_Q[3]
        yb.append(b)
    cb = [0] * 64
    cb[0] = 12 * FLAT_Q[0]
    cr = [0] * 64
    cr[0] = -9 * FLAT_Q[0]
    content = encode_jpeg(
        16, 16, [(2, 2), (1, 1), (1, 1)], FLAT_Q, {0: yb, 1: [cb], 2: [cr]}
    )
    got = decode_baseline_jpeg(content)
    assert got is not None
    w, h, ncomp, planes = got
    assert (w, h, ncomp) == (16, 16, 3)

    ytop = np.concatenate([ref_idct(yb[0], FLAT_Q), ref_idct(yb[1], FLAT_Q)], axis=1)
    ybot = np.concatenate([ref_idct(yb[2], FLAT_Q), ref_idct(yb[3], FLAT_Q)], axis=1)
    Y = np.concatenate([ytop, ybot], axis=0).astype(np.float64)
    Cb = np.kron(ref_idct(cb, FLAT_Q), np.ones((2, 2))).astype(np.float64)
    Cr = np.kron(ref_idct(cr, FLAT_Q), np.ones((2, 2))).astype(np.float64)
    np.testing.assert_array_equal(np.array(planes[0]).reshape(16, 16), Y)
    np.testing.assert_array_equal(np.array(planes[1]).reshape(16, 16), Cb)
    np.testing.assert_array_equal(np.array(planes[2]).reshape(16, 16), Cr)

    r = np.clip(Y + 1.402 * (Cr - 128), 0, 255)
    g = np.clip(Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128), 0, 255)
    b = np.clip(Y + 1.772 * (Cb - 128), 0, 255)
    expect_mean = float((r + g + b).sum() / (3 * 16 * 16) / 255.0)
    got_mean = decode_jpeg_pixels(content)
    assert got_mean is not None
    assert abs(got_mean[2] - expect_mean) < 1e-9


def test_restart_markers_reset_predictors():
    """DRI=1: each MCU is its own restart interval; DC predictors
    reset so each block's stored DC is absolute, and the decoder must
    consume the RST markers between MCUs."""
    b1 = [0] * 64
    b1[0] = 16 * FLAT_Q[0]
    b2 = [0] * 64
    b2[0] = -16 * FLAT_Q[0]
    content = encode_jpeg(16, 8, [(1, 1)], FLAT_Q, {0: [b1, b2]}, restart_interval=1)
    got = decode_baseline_jpeg(content)
    assert got is not None
    plane = np.array(got[3][0]).reshape(8, 16)
    assert set(plane[:, :8].flatten()) == {144}   # 128/8+128
    assert set(plane[:, 8:].flatten()) == {112}   # -128/8+128


def test_odd_dimensions_crop_padding():
    """A 12x10 image needs 2x2 blocks of padding; decoded planes are
    cropped to the declared frame size."""
    blocks = []
    for dc in (8, 16, 24, 32):
        b = [0] * 64
        b[0] = dc * FLAT_Q[0]
        blocks.append(b)
    content = encode_jpeg(12, 10, [(1, 1)], FLAT_Q, {0: blocks})
    got = decode_baseline_jpeg(content)
    assert got is not None
    w, h, _, planes = got
    assert (w, h) == (12, 10)
    assert len(planes[0]) == 12 * 10
    plane = np.array(planes[0]).reshape(10, 12)
    # flat value = dequantized_DC/8 + 128 = (dc·8)/8 + 128 = dc + 128
    assert set(plane[:8, :8].flatten()) == {136}
    assert set(plane[:8, 8:].flatten()) == {144}
    assert set(plane[8:, :8].flatten()) == {152}
    assert set(plane[8:, 8:].flatten()) == {160}


@pytest.mark.parametrize(
    "payload",
    [b"", b"not a jpeg", b"\xff\xd8\xff\xd9", b"\x89PNG\r\n\x1a\n" + b"\x00" * 40],
)
def test_undecodable_payloads_return_none(payload):
    assert decode_baseline_jpeg(payload) is None
    assert decode_jpeg_pixels(payload) is None


def test_image_features_uses_real_jpeg_decode(spark):
    """Through the Spark mapInPandas lane: a real encoded JPEG yields
    its true dimensions AND true mean intensity (flat DC-only tile →
    analytic value), not the stub."""
    from patientdataintegration_spark.operators.multimodal import image_features

    block = [16 * FLAT_Q[0]] + [0] * 63
    content = encode_jpeg(8, 8, [(1, 1)], FLAT_Q, {0: [block]})
    df = spark.createDataFrame(
        [("t.jpg", bytearray(content))], "path string, content binary"
    )
    r = image_features(df).collect()[0]
    assert (r.width, r.height) == (8, 8)
    assert abs(r.mean_intensity - 144 / 255.0) < 1e-12


def test_color_422_asymmetric_upsampling():
    """4:2:2 (2x1 luma sampling): chroma upsamples horizontally only —
    the asymmetric sx/sy path; planes must equal the independent
    reference exactly."""
    y1 = [0] * 64
    y1[0] = 20 * FLAT_Q[0]
    y2 = [0] * 64
    y2[0] = -20 * FLAT_Q[0]
    y2[5] = 3 * FLAT_Q[5]
    cb = [0] * 64
    cb[0] = 6 * FLAT_Q[0]
    cr = [0] * 64
    cr[0] = -4 * FLAT_Q[0]
    cr[2] = 2 * FLAT_Q[2]
    content = encode_jpeg(
        16, 8, [(2, 1), (1, 1), (1, 1)], FLAT_Q, {0: [y1, y2], 1: [cb], 2: [cr]}
    )
    got = decode_baseline_jpeg(content)
    assert got is not None
    w, h, ncomp, planes = got
    assert (w, h, ncomp) == (16, 8, 3)
    Y = np.concatenate([ref_idct(y1, FLAT_Q), ref_idct(y2, FLAT_Q)], axis=1)
    Cb = np.kron(ref_idct(cb, FLAT_Q), np.ones((1, 2)))  # horizontal only
    Cr = np.kron(ref_idct(cr, FLAT_Q), np.ones((1, 2)))
    np.testing.assert_array_equal(np.array(planes[0]).reshape(8, 16), Y)
    np.testing.assert_array_equal(np.array(planes[1]).reshape(8, 16), Cb)
    np.testing.assert_array_equal(np.array(planes[2]).reshape(8, 16), Cr)


def test_restart_interval_two_of_four_mcus():
    """DRI=2 over 4 MCUs: exactly one RST marker (after MCU 2), DC
    predictors reset mid-stream — the modulo path, not the
    every-MCU special case."""
    blocks = []
    for dc in (8, 16, -8, -16):
        b = [0] * 64
        b[0] = dc * FLAT_Q[0]
        blocks.append(b)
    content = encode_jpeg(32, 8, [(1, 1)], FLAT_Q, {0: blocks}, restart_interval=2)
    got = decode_baseline_jpeg(content)
    assert got is not None
    plane = np.array(got[3][0]).reshape(8, 32)
    # flat value = dc + 128 (q=8 cancels the /8)
    assert set(plane[:, 0:8].flatten()) == {136}
    assert set(plane[:, 8:16].flatten()) == {144}
    assert set(plane[:, 16:24].flatten()) == {120}
    assert set(plane[:, 24:32].flatten()) == {112}


def test_truncated_entropy_stream_returns_none():
    """A JPEG cut mid-entropy-stream must decline (None), not decode
    fabricated zero-padding bits into plausible garbage pixels: the
    bit reader's exhausted flag is sticky and checked per block."""
    blocks = []
    for dc in (8, 16, -8, 24, 4, -16, 12, 20):
        b = [0] * 64
        b[1] = 5 * FLAT_Q[1]  # AC content so the stream has real length
        b[0] = dc * FLAT_Q[0]
        blocks.append(b)
    content = encode_jpeg(64, 8, [(1, 1)], FLAT_Q, {0: blocks})
    assert decode_baseline_jpeg(content) is not None  # intact decodes
    # cut inside the entropy segment (past headers, before EOI)
    for cut in (3, 6, 10):
        truncated = content[: len(content) - 2 - cut]
        assert decode_baseline_jpeg(truncated) is None
        assert decode_jpeg_pixels(truncated) is None


# ------------------------------------------- progressive encoder (tests) ---
# Independent minimal SOF2 encoder: fixed one-length huffman tables,
# spectral-selection + successive-approximation scan encoding per
# ITU T.81 G.1.2 (EOB runs, ZRL folding, buffered correction bits).

_P_DC_SYMS = list(range(12))
_P_AC_SYMS = [(r << 4) | s for r in range(16) for s in range(11)]


def _prog_tables():
    dc_bits, dc_vals, dc_codes = _canonical(_P_DC_SYMS)
    ac_bits, ac_vals, ac_codes = _canonical(_P_AC_SYMS)
    return (dc_bits, dc_vals, dc_codes), (ac_bits, ac_vals, ac_codes)


def _enc_ac_first(bw, band_blocks, al, ac_codes):
    """band_blocks: list of (already point-transformed) coefficient
    slices for the scan band, zigzag order."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            L, code = ac_codes[r << 4]
            bw.write(code, L)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0

    for scaled in band_blocks:
        nz = [i for i, v in enumerate(scaled) if v]
        if not nz:
            eobrun += 1
            continue
        flush_eob()
        run = 0
        for i in range(nz[-1] + 1):
            v = scaled[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                L, code = ac_codes[0xF0]
                bw.write(code, L)
                run -= 16
            s = _category(v)
            L, code = ac_codes[(run << 4) | s]
            bw.write(code, L)
            bw.write(_value_bits(v, s), s)
            run = 0
        if nz[-1] < len(scaled) - 1:
            eobrun = 1
    flush_eob()


def _enc_ac_refine(bw, blocks_band_raw, al, ac_codes):
    """blocks_band_raw: per block, the RAW (untransformed) coefficient
    slice for the band; Al is the bit being sent this scan."""
    eobrun = 0
    pending = []

    def emit_eobrun():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            L, code = ac_codes[r << 4]
            bw.write(code, L)
            if r:
                bw.write(eobrun - (1 << r), r)
            eobrun = 0
        for bit in pending:
            bw.write(bit, 1)
        pending = []

    for raw in blocks_band_raw:
        absvals = [abs(v) >> al for v in raw]
        eob = -1
        for i, t in enumerate(absvals):
            if t == 1:
                eob = i
        r = 0
        block_bits = []
        for i, t in enumerate(absvals):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob:
                emit_eobrun()
                L, code = ac_codes[0xF0]
                bw.write(code, L)
                r -= 16
                for bit in block_bits:
                    bw.write(bit, 1)
                block_bits = []
            if t > 1:
                block_bits.append(t & 1)
                continue
            emit_eobrun()
            L, code = ac_codes[(r << 4) | 1]
            bw.write(code, L)
            bw.write(1 if raw[i] > 0 else 0, 1)
            r = 0
            for bit in block_bits:
                bw.write(bit, 1)
            block_bits = []
        if r > 0 or block_bits:
            eobrun += 1
            pending.extend(block_bits)
    emit_eobrun()


def encode_progressive_jpeg(width, height, comps, quant, blocks, scans):
    """Progressive twin of `encode_jpeg`. `blocks`: comp_idx → list of
    64-int unquantized coefficient lists (zigzag) in RASTER order over
    the component's full block grid (mcus_x*hs × mcus_y*vs). `scans`:
    list of (comp_indices, Ss, Se, Ah, Al); multi-component scans must
    be the DC band."""
    hmax = max(h for h, _ in comps)
    vmax = max(v for _, v in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    qb = {
        ci: [[c // q if q else c for c, q in zip(b, quant)] for b in bs]
        for ci, bs in blocks.items()
    }
    (dc_bits, dc_vals, dc_codes), (ac_bits, ac_vals, ac_codes) = _prog_tables()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0]) + bytes(quant))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for ci, (hs, vs) in enumerate(comps):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))

    for comp_sel, ss, se, ah, al in scans:
        sos = bytes([len(comp_sel)])
        for ci in comp_sel:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        bw = _BitWriter()
        if len(comp_sel) > 1:
            assert ss == 0 and se == 0
            pred = {ci: 0 for ci in comp_sel}
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci in comp_sel:
                        hs, vs = comps[ci]
                        gw = mcus_x * hs
                        for by in range(vs):
                            for bx in range(hs):
                                b = qb[ci][(my * vs + by) * gw + (mx * hs + bx)]
                                if ah == 0:
                                    v = b[0] >> al
                                    diff = v - pred[ci]
                                    pred[ci] = v
                                    t = _category(diff)
                                    L, code = dc_codes[t]
                                    bw.write(code, L)
                                    if t:
                                        bw.write(_value_bits(diff, t), t)
                                else:
                                    bw.write((b[0] >> al) & 1, 1)
        else:
            ci = comp_sel[0]
            hs, vs = comps[ci]
            cw = -(-(width * hs) // hmax)
            ch = -(-(height * vs) // vmax)
            bw_ni, bh_ni = -(-cw // 8), -(-ch // 8)
            gw = mcus_x * hs
            order = [
                qb[ci][byi * gw + bxi]
                for byi in range(bh_ni)
                for bxi in range(bw_ni)
            ]
            if ss == 0:
                pred0 = 0
                for b in order:
                    if ah == 0:
                        v = b[0] >> al
                        diff = v - pred0
                        pred0 = v
                        t = _category(diff)
                        L, code = dc_codes[t]
                        bw.write(code, L)
                        if t:
                            bw.write(_value_bits(diff, t), t)
                    else:
                        bw.write((b[0] >> al) & 1, 1)
            elif ah == 0:
                band = [
                    [
                        (abs(b[k]) >> al) * (1 if b[k] >= 0 else -1)
                        for k in range(ss, se + 1)
                    ]
                    for b in order
                ]
                _enc_ac_first(bw, band, al, ac_codes)
            else:
                band_raw = [[b[k] for k in range(ss, se + 1)] for b in order]
                _enc_ac_refine(bw, band_raw, al, ac_codes)
        out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------- progressive tests ---


def _gray_blocks_16x16():
    """Four 8x8 blocks with DC + scattered AC content (zigzag order,
    multiples of q=8 so quantization is exact)."""
    blocks = []
    specs = [
        {0: 16, 1: 5, 7: -3, 20: 7},
        {0: -24, 2: -6, 33: 2, 63: -2},
        {0: 40, 5: 9, 18: -11},
        {0: 8, 1: -1, 40: 3, 41: -3},
    ]
    for spec in specs:
        b = [0] * 64
        for k, v in spec.items():
            b[k] = v * FLAT_Q[k]
        blocks.append(b)
    return blocks


def test_progressive_spectral_selection_matches_baseline():
    """DC scan + two AC band scans (no successive approximation):
    final coefficients are identical to the baseline encoding, so the
    decoded planes must match decode_baseline_jpeg exactly."""
    from patientdataintegration_spark.operators.jpeg import (
        decode_progressive_jpeg,
    )

    blocks = _gray_blocks_16x16()
    base = decode_baseline_jpeg(
        encode_jpeg(16, 16, [(1, 1)], FLAT_Q, {0: blocks})
    )
    assert base is not None
    prog = encode_progressive_jpeg(
        16, 16, [(1, 1)], FLAT_Q, {0: blocks},
        [([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0), ([0], 6, 63, 0, 0)],
    )
    got = decode_progressive_jpeg(prog)
    assert got is not None
    assert got[:3] == base[:3]
    assert got[3] == base[3]
    assert decode_baseline_jpeg(prog) is None  # SOF2 declines in baseline


def test_progressive_successive_approximation_matches_baseline():
    """DC first at Al=1 + DC refinement, AC first at Al=1 + AC
    refinement to Al=0 — the full successive-approximation control
    flow (correction bits, newly-nonzero insertion, EOB runs)."""
    from patientdataintegration_spark.operators.jpeg import (
        decode_progressive_jpeg,
    )

    blocks = _gray_blocks_16x16()
    base = decode_baseline_jpeg(
        encode_jpeg(16, 16, [(1, 1)], FLAT_Q, {0: blocks})
    )
    prog = encode_progressive_jpeg(
        16, 16, [(1, 1)], FLAT_Q, {0: blocks},
        [
            ([0], 0, 0, 0, 1),
            ([0], 1, 63, 0, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ],
    )
    got = decode_progressive_jpeg(prog)
    assert got is not None
    assert got[3] == base[3]


def test_progressive_color_interleaved_dc():
    """4:2:0 color: interleaved DC scan over subsampled grids + three
    single-component AC scans; planes equal the baseline decode."""
    from patientdataintegration_spark.operators.jpeg import (
        decode_progressive_jpeg,
    )

    y_blocks = _gray_blocks_16x16()
    cb = [0] * 64
    cb[0] = 6 * FLAT_Q[0]
    cb[3] = -4 * FLAT_Q[3]
    cr = [0] * 64
    cr[0] = -10 * FLAT_Q[0]
    cr[9] = 2 * FLAT_Q[9]
    comps = [(2, 2), (1, 1), (1, 1)]
    base = decode_baseline_jpeg(
        encode_jpeg(16, 16, comps, FLAT_Q, {0: y_blocks, 1: [cb], 2: [cr]})
    )
    assert base is not None and base[2] == 3
    prog = encode_progressive_jpeg(
        16, 16, comps, FLAT_Q, {0: y_blocks, 1: [cb], 2: [cr]},
        [
            ([0, 1, 2], 0, 0, 0, 0),
            ([0], 1, 63, 0, 0),
            ([1], 1, 63, 0, 0),
            ([2], 1, 63, 0, 0),
        ],
    )
    got = decode_progressive_jpeg(prog)
    assert got is not None
    assert got[3] == base[3]


def test_progressive_eobrun_accumulation():
    """A mostly-empty band across many blocks forces EOBRUN > 1 (EOBn
    with extra bits) in both first and refinement AC scans."""
    from patientdataintegration_spark.operators.jpeg import (
        decode_progressive_jpeg,
    )

    blocks = []
    for i in range(8):  # 64x8 image, 8 blocks
        b = [0] * 64
        b[0] = (4 * i - 10) * FLAT_Q[0]
        if i == 5:
            b[11] = 3 * FLAT_Q[11]
            b[30] = -5 * FLAT_Q[30]
        blocks.append(b)
    base = decode_baseline_jpeg(
        encode_jpeg(64, 8, [(1, 1)], FLAT_Q, {0: blocks})
    )
    prog = encode_progressive_jpeg(
        64, 8, [(1, 1)], FLAT_Q, {0: blocks},
        [
            ([0], 0, 0, 0, 1),
            ([0], 1, 63, 0, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ],
    )
    got = decode_progressive_jpeg(prog)
    assert got is not None
    assert got[3] == base[3]


def test_progressive_truncated_returns_none():
    from patientdataintegration_spark.operators.jpeg import (
        decode_progressive_jpeg,
    )

    blocks = _gray_blocks_16x16()
    prog = encode_progressive_jpeg(
        16, 16, [(1, 1)], FLAT_Q, {0: blocks},
        [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
    )
    assert decode_progressive_jpeg(prog) is not None
    for cut in (3, 8):
        assert decode_progressive_jpeg(prog[: len(prog) - 2 - cut]) is None


def test_progressive_through_image_features(spark):
    """End-to-end: a progressive JPEG rides the mapInPandas lane with
    decode_status 'real' and the true flat intensity."""
    from patientdataintegration_spark.operators.multimodal import image_features

    block = [16 * FLAT_Q[0]] + [0] * 63
    content = encode_progressive_jpeg(
        8, 8, [(1, 1)], FLAT_Q, {0: [block]},
        [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
    )
    df = spark.createDataFrame(
        [("p.jpg", bytearray(content))], "path string, content binary"
    )
    r = image_features(df).collect()[0]
    assert (r.width, r.height) == (8, 8)
    assert r.decode_status == "real"
    assert abs(r.mean_intensity - 144 / 255.0) < 1e-12


def test_progressive_malformed_scan_headers_decline():
    """Scan headers that would misparse the entropy stream are
    rejected: interleaved AC scans (ns>1, band != DC), DC bands with
    Se>0, and >4-component frames (allocation bound)."""
    from patientdataintegration_spark.operators.jpeg import (
        decode_progressive_jpeg,
    )

    blocks = _gray_blocks_16x16()
    good = encode_progressive_jpeg(
        16, 16, [(1, 1)], FLAT_Q, {0: blocks},
        [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
    )
    assert decode_progressive_jpeg(good) is not None

    def patch_sos(content, idx, ss, se):
        """Rewrite the (ss, se) bytes of the idx-th SOS header."""
        out = bytearray(content)
        i, found = 2, 0
        while i + 3 < len(out):
            if out[i] == 0xFF and out[i + 1] == 0xDA:
                if found == idx:
                    ln = int.from_bytes(out[i + 2 : i + 4], "big")
                    ns = out[i + 4]
                    out[i + 5 + 2 * ns] = ss
                    out[i + 6 + 2 * ns] = se
                    return bytes(out)
                found += 1
                i += 2 + int.from_bytes(out[i + 2 : i + 4], "big")
                continue
            i += 1
        raise AssertionError("SOS not found")

    # DC scan rewritten to claim band 0..5 (ss=0, se>0): reject
    assert decode_progressive_jpeg(patch_sos(good, 0, 0, 5)) is None
    # AC scan rewritten to an inverted band: reject
    assert decode_progressive_jpeg(patch_sos(good, 1, 10, 5)) is None

    # interleaved AC scan (ns=3 with ss>0): reject
    y = _gray_blocks_16x16()
    cb = [0] * 64
    cb[0] = 4 * FLAT_Q[0]
    cr = [0] * 64
    cr[0] = -4 * FLAT_Q[0]
    color = encode_progressive_jpeg(
        16, 16, [(2, 2), (1, 1), (1, 1)], FLAT_Q, {0: y, 1: [cb], 2: [cr]},
        [([0, 1, 2], 0, 0, 0, 0), ([0], 1, 63, 0, 0),
         ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)],
    )
    assert decode_progressive_jpeg(color) is not None
    bad = bytearray(color)
    # rewrite the FIRST SOS (ns=3) band from (0,0) to (1,63)
    i = 2
    while not (bad[i] == 0xFF and bad[i + 1] == 0xDA):
        i += 1
    ns = bad[i + 4]
    assert ns == 3
    bad[i + 5 + 2 * ns] = 1
    bad[i + 6 + 2 * ns] = 63
    assert decode_progressive_jpeg(bytes(bad)) is None

    # 5-component SOF2: allocation bound declines
    five = bytearray(good)
    j = 2
    while not (five[j] == 0xFF and five[j + 1] == 0xC2):
        j += 1
    five[j + 9] = 5  # ncomp byte of SOF2 (len(2)+prec(1)+h(2)+w(2))
    assert decode_progressive_jpeg(bytes(five)) is None
