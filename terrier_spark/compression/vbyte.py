"""Numpy-vectorized VByte (variable-byte) integer codec + delta-gap
posting-block format.

Format parity with the reference's chunked integer posting layout
(org/terrier/structures/integer/IntegerCodingPostingOutputStream.java:194-267
and compression/integer/codec/VIntCodec.java:41-81): posting chunks store
docid GAPS and term frequencies as two separately-compressed arrays
("columnar posting format"), chunk size default 1024.  We use the classic
continuation-bit VByte: little-endian 7-bit groups, high bit set on all
but the final byte of each integer (equivalent information content to
Hadoop VInt; byte layout chosen for branch-free numpy decode).

Encoding (all numpy, no per-row Python):
  * gaps: ids[0]+1, diff(ids)  — "+1" so a leading docid 0 still advances,
    mirroring the reference's gamma(first docid + 1) convention
    (org/terrier/structures/postings/bit/BasicIterablePosting.java:38).
  * tfs encoded as-is (tf >= 1).
"""

from __future__ import annotations

import numpy as np

_MASKS = None


def vbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array to VByte bytes (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (1..10)
    nbytes = np.ones(v.size, dtype=np.int64)
    shifted = v >> np.uint64(7)
    while shifted.any():
        nbytes[shifted > 0] += 1
        shifted = shifted >> np.uint64(7)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # byte positions: offsets of each value's first byte
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # fill byte-by-byte position within each value
    # max bytes is small (<=10); loop over byte index, vectorized over values
    maxb = int(nbytes.max())
    vals = v.copy()
    for bi in range(maxb):
        sel = nbytes > bi
        pos = starts[sel] + bi
        chunk = (vals[sel] & np.uint64(0x7F)).astype(np.uint8)
        is_last = nbytes[sel] == bi + 1
        chunk = np.where(is_last, chunk, chunk | np.uint8(0x80))
        out[pos] = chunk
        vals[sel] = vals[sel] >> np.uint64(7)
    return out.tobytes()


def vbyte_decode(data: bytes, count: int | None = None) -> np.ndarray:
    """Decode VByte bytes back to a uint64 array (vectorized)."""
    if not data:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    is_cont = (raw & 0x80) != 0
    # terminal bytes mark value boundaries
    term_idx = np.flatnonzero(~is_cont)
    n = term_idx.size
    payload = (raw & 0x7F).astype(np.uint64)
    # group id for each byte = searchsorted into terminal positions
    group = np.searchsorted(term_idx, np.arange(raw.size), side="left")
    # position of byte within its group (7-bit shift amount)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = term_idx[:-1] + 1
    shift = (np.arange(raw.size) - starts[group]).astype(np.uint64) * np.uint64(7)
    vals = np.zeros(n, dtype=np.uint64)
    np.add.at(vals, group, payload << shift)
    if count is not None and n != count:
        raise ValueError(f"decoded {n} values, expected {count}")
    return vals


def encode_posting_block(docids: np.ndarray, tfs: np.ndarray) -> bytes:
    """Encode one posting block: VByte(first docid + 1, then gaps) ++
    VByte(tfs), length-prefixed (4-byte LE) for self-description."""
    ids = np.asarray(docids, dtype=np.int64)
    if ids.size == 0:
        return b""
    gaps = np.empty(ids.size, dtype=np.uint64)
    gaps[0] = np.uint64(ids[0] + 1)
    if ids.size > 1:
        gaps[1:] = np.diff(ids).astype(np.uint64)
    id_bytes = vbyte_encode(gaps)
    tf_bytes = vbyte_encode(np.asarray(tfs, dtype=np.uint64))
    header = np.array([ids.size, len(id_bytes)], dtype=np.uint32).tobytes()
    return header + id_bytes + tf_bytes


def encode_scoring_block(docids: np.ndarray, tfs: np.ndarray,
                         doclens: np.ndarray) -> bytes:
    """Self-contained scoring block: VByte(gaps) ++ VByte(tfs) ++
    VByte(doclens).  Carrying doclens inside the block means BM25 scoring
    needs NO join against the docs table at query time — at 10^12-doc
    scale neither a broadcast of doclens (the reference loads them all
    into an int[] heap array, FSADocumentIndex.java:39-89) nor a shuffle
    join would be acceptable; ~1 byte/posting here buys both back."""
    ids = np.asarray(docids, dtype=np.int64)
    if ids.size == 0:
        return b""
    gaps = np.empty(ids.size, dtype=np.uint64)
    gaps[0] = np.uint64(ids[0] + 1)
    if ids.size > 1:
        gaps[1:] = np.diff(ids).astype(np.uint64)
    id_bytes = vbyte_encode(gaps)
    tf_bytes = vbyte_encode(np.asarray(tfs, dtype=np.uint64))
    dl_bytes = vbyte_encode(np.asarray(doclens, dtype=np.uint64))
    header = np.array([ids.size, len(id_bytes), len(tf_bytes)],
                      dtype=np.uint32).tobytes()
    return header + id_bytes + tf_bytes + dl_bytes


def decode_scoring_block(block: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (docids int64 ascending, tfs int64, doclens int64)."""
    empty = np.empty(0, dtype=np.int64)
    if not block:
        return empty, empty, empty
    header = np.frombuffer(block[:12], dtype=np.uint32)
    n, id_len, tf_len = int(header[0]), int(header[1]), int(header[2])
    o = 12
    gaps = vbyte_decode(block[o : o + id_len], n)
    tfs = vbyte_decode(block[o + id_len : o + id_len + tf_len], n)
    dls = vbyte_decode(block[o + id_len + tf_len :], n)
    ids = np.cumsum(gaps.astype(np.int64)) - 1
    return ids, tfs.astype(np.int64), dls.astype(np.int64)


def encode_positions(positions_concat: np.ndarray) -> bytes:
    """VByte the concatenated per-posting position lists (the per-posting
    slice lengths are the tfs, so no extra length array is needed —
    positions count == tf, as in the reference's block postings,
    org/terrier/structures/indexing/classical/BlockIndexer.java:84-99)."""
    return vbyte_encode(np.asarray(positions_concat, dtype=np.uint64))


def decode_positions(data: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """-> per-posting position arrays, split by tfs."""
    total = int(np.asarray(tfs).sum())
    flat = vbyte_decode(data, total).astype(np.int64)
    return np.split(flat, np.cumsum(np.asarray(tfs, dtype=np.int64))[:-1])


def decode_posting_block(block: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode one posting block -> (docids int64 ascending, tfs int64)."""
    if not block:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    header = np.frombuffer(block[:8], dtype=np.uint32)
    n, id_len = int(header[0]), int(header[1])
    gaps = vbyte_decode(block[8 : 8 + id_len], n)
    tfs = vbyte_decode(block[8 + id_len :], n)
    ids = np.cumsum(gaps.astype(np.int64)) - 1
    return ids, tfs.astype(np.int64)
