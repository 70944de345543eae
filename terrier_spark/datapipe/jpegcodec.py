"""Pure-stdlib baseline JPEG codec: ITU-T T.81 sequential DCT decode
(segment parse, DHT canonical Huffman, DC prediction + AC run-length
in zigzag order, dequantize, 8x8 IDCT, chroma upsampling, JFIF
YCbCr -> RGB) and a matching encoder used by the tests — struct +
numpy only, no libjpeg.

Scope: baseline sequential (SOF0), grayscale or 3-component YCbCr at
4:4:4 / 4:2:2 / 4:2:0 sampling, restart intervals.  Progressive
(SOF2), arithmetic coding and 12-bit precision raise ValueError — the
imagemeta.py header parser still reports their metadata.

JPEG is lossy: round-trips are exact only for DC-flat blocks; the
tests bound reconstruction error (PSNR) instead of demanding equality.

This is a correctness-first reference kernel: the entropy decode walks
bits in Python (fine for the Arrow-batched per-image path at test
scale); a production 100-TB deployment would swap `decode_jpeg` for a
libjpeg-turbo binding behind the same signature.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

# ------------------------------------------------------------ shared bits


def _zigzag_order() -> List[Tuple[int, int]]:
    out = []
    for s in range(15):
        rng = range(max(0, s - 7), min(s, 7) + 1)
        for r in (rng if s % 2 else reversed(rng)):
            out.append((r, s - r))
    return out


_ZIGZAG = _zigzag_order()
_ZIG_ROWS = np.array([r for r, _ in _ZIGZAG])
_ZIG_COLS = np.array([c for _, c in _ZIGZAG])


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5


_DCT = _dct_matrix()

# ITU-T T.81 Annex K.1 luminance quantization table (public spec)
_QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)
# Annex K.2 chrominance table
_QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((qt * scale + 50) // 100, 1, 255).astype(np.int32)


# --------------------------------------------------------------- decoder


class _BitReader:
    """MSB-first entropy-stream reader with 0xFF00 byte-unstuffing;
    stops at any non-stuffing marker (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt & 0x07)
            else:
                raise ValueError("unexpected marker inside entropy data")
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self):
        self.nbits = 0
        self.bitbuf = 0

    def skip_restart(self, expected: int):
        """Consume the RSTn marker at the current byte position."""
        self.align()
        if (self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + expected):
            raise ValueError("missing expected restart marker")
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, n):
        self.n = n


def _build_huff(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """DHT canonical code construction (T.81 Annex C): (length, code)
    -> symbol."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(br: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG -> uint8 (H,W) grayscale or (H,W,3) RGB."""
    b = bytes(data)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    qts: Dict[int, np.ndarray] = {}
    huff_dc: Dict[int, dict] = {}
    huff_ac: Dict[int, dict] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            raise ValueError("corrupt JPEG segment chain")
        marker = b[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (seg_len,) = struct.unpack(">H", b[i + 2:i + 4])
        seg = b[i + 4:i + 2 + seg_len]
        if marker == 0xDB:   # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization not supported")
                qt = np.zeros((8, 8), dtype=np.int32)
                qt[_ZIG_ROWS, _ZIG_COLS] = np.frombuffer(
                    seg[j + 1:j + 65], dtype=np.uint8)
                qts[tq] = qt
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                cnt = sum(bits)
                vals = list(seg[j + 17:j + 17 + cnt])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, vals)
                j += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS: entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0x0F)
            return _decode_scan(b, i + 2 + seg_len, frame, scan, qts,
                                huff_dc, huff_ac, restart_interval)
        i += 2 + seg_len
    raise ValueError("JPEG has no scan")


def _decode_scan(b, pos, frame, scan, qts, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    br = _BitReader(b, pos)
    preds = [0] * len(comps)
    rst_count = 0
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and \
                    mcu_index % restart_interval == 0:
                br.skip_restart(rst_count & 0x07)
                rst_count += 1
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = huff_dc[scan[c["id"]][0]]
                ac_tab = huff_ac[scan[c["id"]][1]] if c["id"] in scan \
                    else None
                qt = qts[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(br, dc_tab, ac_tab, preds,
                                              ci, qt)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_index += 1
    # upsample to full resolution and crop
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(br, dc_tab, ac_tab, preds, ci, qt) -> np.ndarray:
    coeff = np.zeros(64, dtype=np.float64)
    s = _huff_decode(br, dc_tab)
    diff = _extend(br.receive(s), s) if s else 0
    preds[ci] += diff
    coeff[0] = preds[ci]
    k = 1
    while k < 64:
        rs = _huff_decode(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:   # ZRL: sixteen zeros
                k += 16
                continue
            break          # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coeff[k] = _extend(br.receive(s), s)
        k += 1
    dq = np.zeros((8, 8), dtype=np.float64)
    dq[_ZIG_ROWS, _ZIG_COLS] = coeff
    dq *= qt
    return _DCT.T @ dq @ _DCT + 128.0


# --------------------------------------------------------------- encoder

def _flat_huff(nsym: int, length: int):
    """Canonical single-length Huffman spec: nsym symbols, all `length`
    bits (nsym < 2^length keeps the all-ones code unused, as T.81
    requires).  -> (bits[16], vals)."""
    assert nsym < (1 << length)
    bits = [0] * 16
    bits[length - 1] = nsym
    return bits, list(range(nsym))


_DC_BITS, _DC_VALS = _flat_huff(12, 5)
_AC_SYMS = sorted({(r << 4) | s for r in range(16) for s in range(1, 11)}
                  | {0x00, 0xF0})
_AC_BITS = [0] * 16
_AC_BITS[8 - 1] = len(_AC_SYMS)   # 162 symbols, 8 bits each (< 256)


def _encode_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)   # stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: str = "444",
                restart_interval: int = 0) -> bytes:
    """uint8 (H,W) gray or (H,W,3) RGB -> baseline JFIF JPEG.
    subsample: "444" or "420" (RGB only)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("encode_jpeg wants (H,W) or (H,W,3)")
    h, w = img.shape[:2]
    qt_l = _scale_qt(_QT_LUMA, quality)
    qt_c = _scale_qt(_QT_CHROMA, quality)
    if gray:
        planes = [img.astype(np.float64)]
        samps = [(1, 1)]
        qtabs = [0]
    else:
        rgb = img.astype(np.float64)
        r, g, bl = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bl
        cb = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
        if subsample == "420":
            cb = _box_down2(cb)
            cr = _box_down2(cr)
            samps = [(2, 2), (1, 1), (1, 1)]
        elif subsample == "444":
            samps = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError("subsample must be '444' or '420'")
        planes = [y, cb, cr]
        qtabs = [0, 1, 1]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for (sh, sv), p in zip(samps, planes):
        ph, pw = mcuy * sv * 8, mcux * sh * 8
        pp = np.empty((ph, pw))
        pp[: p.shape[0], : p.shape[1]] = p
        pp[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        pp[:, p.shape[1]:] = pp[:, p.shape[1] - 1:p.shape[1]]
        padded.append(pp)

    dc_codes = _encode_codes(_DC_BITS, _DC_VALS)
    ac_codes = _encode_codes(_AC_BITS, _AC_SYMS)
    bw = _BitWriter()
    preds = [0] * len(planes)
    qts = [qt_l, qt_c]
    rst = 0
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and \
                    mcu_index % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * len(planes)
            for ci, ((sh, sv), p) in enumerate(zip(samps, padded)):
                qt = qts[qtabs[ci]]
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        block = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                        co = _DCT @ block @ _DCT.T
                        q = np.round(co / qt).astype(np.int64)
                        zz = q[_ZIG_ROWS, _ZIG_COLS]
                        _emit_block(bw, zz, preds, ci, dc_codes, ac_codes)
            mcu_index += 1
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tq, qt):
        return seg(0xDB, bytes([tq])
                   + bytes(qt[_ZIG_ROWS, _ZIG_COLS].astype(np.uint8)))

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, qtabs[ci]])
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qt_l)
    if ncomp == 3:
        out += dqt(1, qt_c)
    out += seg(0xC0, sof)
    out += dht(0, 0, _DC_BITS, _DC_VALS)
    out += dht(1, 0, _AC_BITS, _AC_SYMS)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def _emit_block(bw, zz, preds, ci, dc_codes, ac_codes):
    diff = int(zz[0]) - preds[ci]
    preds[ci] = int(zz[0])
    s = _mag_cat(diff)
    bw.write(*reversed(dc_codes[s]))
    if s:
        v = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(v, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                bw.write(*reversed(ac_codes[0x00]))   # EOB
                return
            run += 1
            if run == 16:
                bw.write(*reversed(ac_codes[0xF0]))   # ZRL
                run = 0
            continue
        s = _mag_cat(v)
        bw.write(*reversed(ac_codes[(run << 4) | s]))
        u = v if v >= 0 else v + (1 << s) - 1
        bw.write(u, s)
        run = 0


def _box_down2(p: np.ndarray) -> np.ndarray:
    """2x2 box-filter downsample with edge replication to even dims."""
    h, w = p.shape
    if h % 2:
        p = np.vstack([p, p[-1:]])
    if w % 2:
        p = np.hstack([p, p[:, -1:]])
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2]
            + p[1::2, 1::2]) / 4.0
