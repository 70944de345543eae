"""Bit-level posting codecs mirroring the reference's non-VByte formats.

The engine's persistent format is the chunked VByte layout (pinned by
the build target; see compression/vbyte.py).  This module provides the
reference's OTHER codecs for format parity and interop:

* unary / Elias gamma / Elias delta — the classic Terrier "bit" posting
  format stores [gamma(first docid+1), unary(tf)] then
  [gamma(docid gap), unary(tf)] per posting
  (org/terrier/structures/postings/bit/BasicIterablePosting.java:38,
  org/terrier/compression/bit/BitOutBase.java writeGamma/writeUnary).
* Golomb-Rice — org/terrier/compression/integer/codec/GolombCodec.java.
* minimal (truncated) binary and skewed Golomb —
  org/terrier/compression/bit/BitOutputStream.java:314-346 /
  BitInBase.java:117-141 (doubling buckets keyed by unary bucket id,
  minimal-binary offset within the bucket).
* binary interpolative — .../codec/LemireCodec wrappers aside, Terrier
  ships an interpolative coder for docid lists.
* Lemire-family block codecs: FOR (frame-of-reference bit packing),
  NewPFD-style patched FOR, and Simple16
  (org/terrier/compression/integer/codec/LemireCodec.java and friends).

All encoders take / return numpy arrays; decoders are exact inverses
(hypothesis round-trip tested).  These are offline/interop codecs — the
query hot path stays on the vectorized VByte blocks.
"""

from __future__ import annotations

from typing import List

import numpy as np


class BitWriter:
    """MSB-first bit stream writer (matches the reference's bit files,
    org/terrier/compression/bit/BitOutBase.java)."""

    def __init__(self) -> None:
        self._bits: List[int] = []

    def write_bit(self, b: int) -> None:
        self._bits.append(b & 1)

    def write_bits(self, value: int, width: int) -> None:
        for i in range(width - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def write_unary(self, value: int) -> None:
        """value >= 1: (value-1) zero bits then a one (reference
        convention: writeUnary(x) emits x-1 0s + terminating 1)."""
        if value < 1:
            raise ValueError("unary encodes integers >= 1")
        self._bits.extend([0] * (value - 1))
        self._bits.append(1)

    def write_gamma(self, value: int) -> None:
        """Elias gamma for value >= 1: unary(len) + binary remainder."""
        if value < 1:
            raise ValueError("gamma encodes integers >= 1")
        nbits = value.bit_length()
        self.write_unary(nbits)
        self.write_bits(value - (1 << (nbits - 1)), nbits - 1)

    def write_delta(self, value: int) -> None:
        """Elias delta for value >= 1: gamma(len) + binary remainder."""
        if value < 1:
            raise ValueError("delta encodes integers >= 1")
        nbits = value.bit_length()
        self.write_gamma(nbits)
        self.write_bits(value - (1 << (nbits - 1)), nbits - 1)

    def write_golomb(self, value: int, b: int) -> None:
        """Golomb code for value >= 1 with parameter b (truncated-binary
        remainder, as the reference's GolombCodec)."""
        if value < 1:
            raise ValueError("golomb encodes integers >= 1")
        q, r = divmod(value - 1, b)
        self.write_unary(q + 1)
        nbits = (b - 1).bit_length() if b > 1 else 0
        if b == 1:
            return
        cutoff = (1 << nbits) - b
        if r < cutoff:
            self.write_bits(r, nbits - 1)
        else:
            self.write_bits(r + cutoff, nbits)

    def write_minimal_binary(self, x: int, b: int) -> None:
        """Minimal binary (truncated binary) code for 0 <= x < b over a
        b-value alphabet (org/terrier/compression/bit/
        BitOutputStream.java:346): the first m = 2^(log2b+1) - b values
        take log2b bits, the rest take log2b+1 bits holding m + x."""
        if not 0 <= x < max(b, 1):
            raise ValueError("minimal binary needs 0 <= x < b")
        if b <= 1:
            return  # a 1-value alphabet carries no information
        log2b = b.bit_length() - 1
        m = (1 << (log2b + 1)) - b
        if x < m:
            self.write_bits(x, log2b)
        else:
            self.write_bits(m + x, log2b + 1)

    def write_skewed_golomb(self, x: int, b: int) -> None:
        """Skewed-Golomb code for x >= 0 with parameter b >= 1
        (org/terrier/compression/bit/BitOutputStream.java:314): bucket
        i = msb(x/b + 1) holds the b*2^i values in
        [(2^i - 1)*b, (2^(i+1) - 1)*b), written as unary(i+1) plus the
        minimal-binary offset within the bucket — buckets double in
        width, skewing short codes toward small gaps."""
        if x < 0 or b < 1:
            raise ValueError("skewed golomb needs x >= 0, b >= 1")
        i = (x // b + 1).bit_length() - 1
        self.write_unary(i + 1)
        m = ((1 << i) - 1) * b
        big_m = ((1 << (i + 1)) - 1) * b
        self.write_minimal_binary(x - m, big_m - m)

    def getvalue(self) -> bytes:
        bits = self._bits
        n = len(bits)
        out = np.zeros((n + 7) // 8, dtype=np.uint8)
        arr = np.asarray(bits, dtype=np.uint8)
        pos = np.arange(n)
        np.bitwise_or.at(out, pos // 8, arr << (7 - (pos % 8)))
        return out.tobytes()

    def __len__(self) -> int:
        return len(self._bits)


class BitReader:
    """MSB-first bit stream reader."""

    def __init__(self, data: bytes) -> None:
        arr = np.frombuffer(data, dtype=np.uint8)
        self._bits = np.unpackbits(arr)
        self._pos = 0

    def read_bit(self) -> int:
        b = int(self._bits[self._pos])
        self._pos += 1
        return b

    def read_bits(self, width: int) -> int:
        v = 0
        for _ in range(width):
            v = (v << 1) | self.read_bit()
        return v

    def read_unary(self) -> int:
        n = 1
        while self.read_bit() == 0:
            n += 1
        return n

    def read_gamma(self) -> int:
        nbits = self.read_unary()
        return (1 << (nbits - 1)) | self.read_bits(nbits - 1)

    def read_delta(self) -> int:
        nbits = self.read_gamma()
        return (1 << (nbits - 1)) | self.read_bits(nbits - 1)

    def read_minimal_binary(self, b: int) -> int:
        """Inverse of write_minimal_binary (BitInBase.java:133
        semantics, made a strict inverse: the reference reader's +1 in
        the short branch belongs to its Golomb caller)."""
        if b <= 1:
            return 0
        log2b = b.bit_length() - 1
        m = (1 << (log2b + 1)) - b
        x = self.read_bits(log2b)
        if x < m:
            return x
        return ((x << 1) | self.read_bit()) - m

    def read_skewed_golomb(self, b: int) -> int:
        """Inverse of write_skewed_golomb (BitInBase.java:117)."""
        i = self.read_unary() - 1
        m = ((1 << i) - 1) * b
        big_m = ((1 << (i + 1)) - 1) * b
        return m + self.read_minimal_binary(big_m - m)

    def read_golomb(self, b: int) -> int:
        q = self.read_unary() - 1
        if b == 1:
            return q * b + 1
        nbits = (b - 1).bit_length()
        cutoff = (1 << nbits) - b
        r = self.read_bits(nbits - 1)
        if r >= cutoff:
            r = ((r << 1) | self.read_bit()) - cutoff
        return q * b + r + 1


# --------------------------------------------------- bit posting format

def encode_bit_postings(ids: np.ndarray, tfs: np.ndarray) -> bytes:
    """The reference bit inverted-file layout for one posting list:
    gamma(first docid + 1) unary(tf), then gamma(gap) unary(tf) —
    BasicIterablePosting.java:38."""
    ids = np.asarray(ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    w = BitWriter()
    prev = -1
    for d, t in zip(ids.tolist(), tfs.tolist()):
        w.write_gamma(d - prev)
        w.write_unary(int(t))
        prev = d
    return w.getvalue()


def decode_bit_postings(data: bytes, count: int) -> tuple:
    r = BitReader(data)
    ids = np.empty(count, dtype=np.int64)
    tfs = np.empty(count, dtype=np.int64)
    prev = -1
    for i in range(count):
        prev = prev + r.read_gamma()
        ids[i] = prev
        tfs[i] = r.read_unary()
    return ids, tfs


# ------------------------------------------------ binary interpolative

def _interp_encode(w: BitWriter, ids: List[int], lo: int, hi: int) -> None:
    if not ids:
        return
    if len(ids) == 1:
        width = (hi - lo).bit_length()
        w.write_bits(ids[0] - lo, width)
        return
    mid = len(ids) // 2
    v = ids[mid]
    # v is between lo+mid and hi-(len-1-mid)
    vlo = lo + mid
    vhi = hi - (len(ids) - 1 - mid)
    width = (vhi - vlo).bit_length()
    w.write_bits(v - vlo, width)
    _interp_encode(w, ids[:mid], lo, v - 1)
    _interp_encode(w, ids[mid + 1:], v + 1, hi)


def interpolative_encode(ids: np.ndarray, universe: int) -> bytes:
    """Binary interpolative coding of a strictly-increasing docid list
    over [0, universe)."""
    lst = np.asarray(ids, dtype=np.int64).tolist()
    w = BitWriter()
    _interp_encode(w, lst, 0, universe - 1)
    return w.getvalue()


def _interp_decode(r: BitReader, out: List[int], n: int, lo: int,
                   hi: int) -> None:
    if n == 0:
        return
    if n == 1:
        width = (hi - lo).bit_length()
        out.append(lo + r.read_bits(width))
        return
    mid = n // 2
    vlo = lo + mid
    vhi = hi - (n - 1 - mid)
    width = (vhi - vlo).bit_length()
    v = vlo + r.read_bits(width)
    left: List[int] = []
    _interp_decode(r, left, mid, lo, v - 1)
    out.extend(left)
    out.append(v)
    right: List[int] = []
    _interp_decode(r, right, n - 1 - mid, v + 1, hi)
    out.extend(right)


def interpolative_decode(data: bytes, count: int,
                         universe: int) -> np.ndarray:
    r = BitReader(data)
    out: List[int] = []
    _interp_decode(r, out, count, 0, universe - 1)
    return np.asarray(out, dtype=np.int64)


# ------------------------------------------------- Lemire block codecs

def for_encode(values: np.ndarray) -> bytes:
    """Frame-of-reference: store min + fixed bit width + packed deltas
    (numpy-vectorized packing)."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        return b""
    base = int(v.min())
    deltas = (v - base).astype(np.uint64)
    width = max(int(deltas.max()).bit_length(), 1)
    header = np.array([v.size, base, width], dtype=np.int64).tobytes()
    # pack each delta into `width` bits, MSB-first
    bits = ((deltas[:, None] >> np.arange(width - 1, -1, -1,
                                          dtype=np.uint64))
            & np.uint64(1)).astype(np.uint8).reshape(-1)
    return header + np.packbits(bits).tobytes()


def for_decode(data: bytes) -> np.ndarray:
    if not data:
        return np.empty(0, dtype=np.int64)
    n, base, width = np.frombuffer(data[:24], dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(data[24:], dtype=np.uint8))
    bits = bits[: n * width].reshape(int(n), int(width)).astype(np.uint64)
    weights = np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64)
    return (bits * weights).sum(axis=1).astype(np.int64) + base


def pfor_encode(values: np.ndarray, page: int = 128) -> bytes:
    """Patched FOR (NewPFD-style): per page, pick a width covering 90%
    of values; larger ones become exceptions stored verbatim."""
    v = np.asarray(values, dtype=np.int64)
    out = [np.array([v.size], dtype=np.int64).tobytes()]
    for s in range(0, v.size, page):
        chunk = v[s:s + page]
        base = int(chunk.min())
        deltas = (chunk - base).astype(np.uint64)
        widths = np.maximum(
            [int(x).bit_length() for x in deltas.tolist()], 1
        )
        width = int(np.percentile(widths, 90))
        exc = deltas >= (np.uint64(1) << np.uint64(width))
        stored = np.where(exc, np.uint64(0), deltas)
        head = np.array(
            [chunk.size, base, width, int(exc.sum())], dtype=np.int64
        ).tobytes()
        bits = ((stored[:, None] >> np.arange(width - 1, -1, -1,
                                              dtype=np.uint64))
                & np.uint64(1)).astype(np.uint8).reshape(-1)
        exc_pos = np.where(exc)[0].astype(np.int64)
        exc_val = deltas[exc].astype(np.int64)
        out.append(head + np.packbits(bits).tobytes().ljust(
            (chunk.size * width + 7) // 8, b"\0")
            + exc_pos.tobytes() + exc_val.tobytes())
    return b"".join(out)


def pfor_decode(data: bytes) -> np.ndarray:
    total = int(np.frombuffer(data[:8], dtype=np.int64)[0])
    off = 8
    parts = []
    got = 0
    while got < total:
        n, base, width, nexc = np.frombuffer(
            data[off:off + 32], dtype=np.int64
        )
        off += 32
        nbytes = (int(n) * int(width) + 7) // 8
        bits = np.unpackbits(
            np.frombuffer(data[off:off + nbytes], dtype=np.uint8)
        )[: int(n) * int(width)].reshape(int(n), int(width))
        off += nbytes
        weights = (np.uint64(1)
                   << np.arange(int(width) - 1, -1, -1, dtype=np.uint64))
        vals = (bits.astype(np.uint64) * weights).sum(axis=1)
        if nexc:
            pos = np.frombuffer(data[off:off + 8 * int(nexc)],
                                dtype=np.int64)
            off += 8 * int(nexc)
            ev = np.frombuffer(data[off:off + 8 * int(nexc)],
                               dtype=np.int64)
            off += 8 * int(nexc)
            vals[pos] = ev.astype(np.uint64)
        parts.append(vals.astype(np.int64) + int(base))
        got += int(n)
    return np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)


# Simple16: 16 packing modes for a 28-bit payload in each 32-bit word;
# (count, width) run lists per mode, classic Simple16 table
_S16 = [
    [(28, 1)],
    [(7, 2), (14, 1)],
    [(7, 1), (7, 2), (7, 1)],
    [(14, 1), (7, 2)],
    [(14, 2)],
    [(1, 4), (8, 3)],
    [(1, 3), (4, 4), (3, 3)],
    [(7, 4)],
    [(4, 5), (2, 4)],
    [(2, 4), (4, 5)],
    [(3, 6), (2, 5)],
    [(2, 5), (3, 6)],
    [(4, 7)],
    [(1, 10), (2, 9)],
    [(2, 14)],
    [(1, 28)],
]


def _s16_fits(vals: List[int], runs: List[tuple]) -> bool:
    i = 0
    for count, width in runs:
        for _ in range(count):
            if i >= len(vals):
                return True  # partial fill allowed only at stream end
            if vals[i] >= (1 << width):
                return False
            i += 1
    return True


def simple16_encode(values: np.ndarray) -> bytes:
    """Simple16: greedy densest-mode packing of non-negative ints < 2^28
    into 32-bit words (classic Anh&Moffat table, as Terrier's Simple16)."""
    vals = np.asarray(values, dtype=np.int64).tolist()
    if any(x < 0 or x >= (1 << 28) for x in vals):
        raise ValueError("simple16 packs non-negative ints < 2^28")
    words = [len(vals)]
    i = 0
    while i < len(vals):
        for mode, runs in enumerate(_S16):
            cap = sum(c for c, _ in runs)
            window = vals[i:i + cap]
            if _s16_fits(window, runs):
                word = mode << 28
                shift = 28
                j = i
                for count, width in runs:
                    for _ in range(count):
                        shift -= width
                        if j < len(vals):
                            word |= vals[j] << shift
                            j += 1
                words.append(word)
                i = j
                break
        else:  # pragma: no cover - mode 15 always fits values < 2^28
            raise AssertionError("no simple16 mode fits")
    return np.asarray(words, dtype=np.uint32).tobytes()


def simple16_decode(data: bytes) -> np.ndarray:
    words = np.frombuffer(data, dtype=np.uint32)
    total = int(words[0])
    out: List[int] = []
    for word in words[1:].tolist():
        mode = word >> 28
        shift = 28
        for count, width in _S16[mode]:
            mask = (1 << width) - 1
            for _ in range(count):
                shift -= width
                if len(out) < total:
                    out.append((word >> shift) & mask)
    return np.asarray(out[:total], dtype=np.int64)
