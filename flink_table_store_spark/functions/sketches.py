"""Exact sketch wire formats — RoaringBitmap (rbm32/rbm64) and Apache
DataSketches compact theta sketches.

The aggregation merge engine's ``rbm32`` / ``rbm64`` / ``theta_sketch``
aggregators (reference: paimon-common aggregate/FieldRoaringBitmap32Agg
.java, FieldRoaringBitmap64Agg.java, FieldThetaSketchAgg.java) operate
on SERIALIZED sketch bytes: rows carry serialized sketches, the
aggregator deserializes, unions and re-serializes. This module
implements both byte formats from their public specifications so the
stored bytes are interchangeable with other systems:

* RoaringBitmap portable format — the cross-language spec published at
  github.com/RoaringBitmap/RoaringFormatSpec (the format CRoaring,
  RoaringBitmap-Java, pilosa et al agree on). We read all three
  container kinds (array / bitmap / run, both the 12346 and 12347
  cookies) and write the no-run layout (cookie 12346), which every
  conforming reader accepts. 64-bit bitmaps use the portable 64-bit
  layout (u64 bucket count, then per bucket: u32 high bits + embedded
  32-bit bitmap) shared by CRoaring's ``roaring64`` and Java
  ``Roaring64NavigableMap.serializePortable``.

* DataSketches theta — the compact (ordered) theta sketch binary
  layout from datasketches-java theta/PreambleUtil.java (serVer 3,
  family COMPACT=3): 8-byte preamble [preLongs, serVer=3, famID=3, 0,
  0, flags, seedHash×2], optional curCount long, optional thetaLong,
  then the retained hashes sorted ascending. Hashing is MurmurHash3
  x64_128 (public-domain Appleby construction, the same function
  datasketches uses) of the value's little-endian bytes under the
  default update seed 9001, keeping ``h1 >>> 1``. Estimation is the
  standard retained/theta.

Everything here is plain numpy/stdlib — no Spark imports — so the
functions run identically driver-side and inside Arrow-batched UDFs
(see merge_engines._agg_expr for the aggregation-engine integration).

NOTE: the container has no ``datasketches``/``pyroaring`` wheels to
cross-check against, so conformance is asserted structurally (byte
layout, known-size fixtures, roundtrips) against the published specs
cited above.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# MurmurHash3 x64_128 (Appleby's public-domain construction; the exact
# variant datasketches-java hash/MurmurHash3.java implements)
# ---------------------------------------------------------------------------

_MASK = 0xFFFFFFFFFFFFFFFF
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """(h1, h2) of the 128-bit MurmurHash3 x64 variant."""
    h1 = h2 = seed & _MASK
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    for i in range(len(tail) - 1, 7, -1):  # bytes 8..15 -> k2
        k2 = (k2 << 8) | tail[i]
    for i in range(min(len(tail), 8) - 1, -1, -1):  # bytes 0..7 -> k1
        k1 = (k1 << 8) | tail[i]
    if len(tail) > 8:
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    if len(tail) > 0:
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1, h2


# ---------------------------------------------------------------------------
# DataSketches compact theta sketch
# ---------------------------------------------------------------------------

DEFAULT_UPDATE_SEED = 9001  # datasketches Util.DEFAULT_UPDATE_SEED
DEFAULT_THETA_K = 4096
_THETA_MAX = 1 << 63  # thetaLong of an exact-mode sketch
_SER_VER = 3
_FAMILY_COMPACT = 3
_FLAG_READ_ONLY = 2
_FLAG_EMPTY = 4
_FLAG_COMPACT = 8
_FLAG_ORDERED = 16


def seed_hash(seed: int = DEFAULT_UPDATE_SEED) -> int:
    """Util.computeSeedHash: low 16 bits of murmur(seed-as-long, 0)."""
    h1, _ = murmur3_x64_128(struct.pack("<q", seed), 0)
    sh = h1 & 0xFFFF
    if sh == 0:
        raise ValueError("seed hashes to 0; choose a different seed")
    return sh


def _hash_long(v: int, seed: int) -> int:
    """Theta hash of a 64-bit value: murmur of its LE bytes, h1 >>> 1."""
    h1, _ = murmur3_x64_128(struct.pack("<q", int(v)), seed)
    return h1 >> 1


def _hash_bytes(b: bytes, seed: int) -> int:
    h1, _ = murmur3_x64_128(b, seed)
    return h1 >> 1


def theta_hashes(values, seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
    """Sorted distinct theta hashes (uint64) of a value collection.
    Ints hash as 8-byte LE longs (datasketches update(long)); str as
    UTF-8 bytes (update(String) hashes the char array's UTF-8 form);
    bytes as-is."""
    out = set()
    for v in values:
        if v is None:
            continue
        if isinstance(v, (bytes, bytearray)):
            h = _hash_bytes(bytes(v), seed)
        elif isinstance(v, str):
            h = _hash_bytes(v.encode("utf-8"), seed)
        else:
            h = _hash_long(int(v), seed)
        if h != 0:  # 0 is reserved (cannot be stored)
            out.add(h)
    return np.sort(np.fromiter(out, dtype=np.uint64, count=len(out)))


def theta_serialize(
    hashes: np.ndarray,
    theta: int = _THETA_MAX,
    k: int = DEFAULT_THETA_K,
    seed: int = DEFAULT_UPDATE_SEED,
) -> bytes:
    """Serialize sorted distinct hashes (< theta) as a compact ordered
    theta sketch. Trims to nominal k: if more than k hashes are retained
    theta drops to the (k+1)-th smallest (the QuickSelect rebuild
    contract — an estimating sketch never retains more than k)."""
    hs = np.asarray(hashes, dtype=np.uint64)
    hs = hs[hs < np.uint64(theta)]
    if len(hs) > k:
        theta = int(hs[k])
        hs = hs[:k]
    sh = seed_hash(seed)
    if len(hs) == 0 and theta == _THETA_MAX:
        flags = _FLAG_READ_ONLY | _FLAG_EMPTY | _FLAG_COMPACT | _FLAG_ORDERED
        return struct.pack("<BBBBBBH", 1, _SER_VER, _FAMILY_COMPACT, 0, 0, flags, sh)
    flags = _FLAG_READ_ONLY | _FLAG_COMPACT | _FLAG_ORDERED
    if theta == _THETA_MAX:  # exact mode: 2 preamble longs
        pre = struct.pack("<BBBBBBHiI", 2, _SER_VER, _FAMILY_COMPACT, 0, 0, flags, sh, len(hs), 0)
    else:  # estimating: 3 preamble longs, thetaLong in long 2
        pre = struct.pack(
            "<BBBBBBHiIQ", 3, _SER_VER, _FAMILY_COMPACT, 0, 0, flags, sh, len(hs), 0, theta
        )
    return pre + hs.tobytes()


def theta_deserialize(data: bytes, seed: int = DEFAULT_UPDATE_SEED):
    """-> (hashes ascending uint64 ndarray, thetaLong). Accepts compact
    sketches of preamble 1 (empty / single-item), 2 (exact) and 3
    (estimating); verifies serVer, family and seed hash."""
    if len(data) < 8:
        raise ValueError("theta sketch too short")
    pre_longs, ser_ver, family, _, _, flags, sh = struct.unpack_from("<BBBBBBH", data, 0)
    pre_longs &= 0x3F
    if ser_ver != _SER_VER:
        raise ValueError(f"unsupported theta serVer {ser_ver}")
    if family != _FAMILY_COMPACT:
        raise ValueError(f"not a compact theta sketch (family {family})")
    if sh != seed_hash(seed):
        raise ValueError("theta sketch seed hash mismatch")
    if pre_longs == 1:
        if flags & _FLAG_EMPTY:
            return np.empty(0, dtype=np.uint64), _THETA_MAX
        # SingleItemSketch: one hash in long 1
        (h,) = struct.unpack_from("<Q", data, 8)
        return np.array([h], dtype=np.uint64), _THETA_MAX
    (count,) = struct.unpack_from("<i", data, 8)
    theta = _THETA_MAX
    off = 8 * pre_longs
    if pre_longs >= 3:
        (theta,) = struct.unpack_from("<Q", data, 16)
    hs = np.frombuffer(data, dtype=np.uint64, count=count, offset=off).copy()
    return np.sort(hs), theta


def theta_union(
    sketches, k: int = DEFAULT_THETA_K, seed: int = DEFAULT_UPDATE_SEED
) -> bytes:
    """Union serialized sketches -> serialized compact ordered sketch.
    theta = min over inputs; survivors deduped, trimmed to k."""
    theta = _THETA_MAX
    parts = []
    for s in sketches:
        if s is None:
            continue
        hs, th = theta_deserialize(bytes(s), seed)
        theta = min(theta, th)
        parts.append(hs)
    if not parts:
        return theta_serialize(np.empty(0, dtype=np.uint64), _THETA_MAX, k, seed)
    allh = np.unique(np.concatenate(parts))
    return theta_serialize(allh, theta, k, seed)


def theta_sketch_of(values, k: int = DEFAULT_THETA_K, seed: int = DEFAULT_UPDATE_SEED) -> bytes:
    """Build a serialized compact theta sketch from raw values."""
    return theta_serialize(theta_hashes(values, seed), _THETA_MAX, k, seed)


def theta_estimate(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> float:
    hs, theta = theta_deserialize(bytes(data), seed)
    return len(hs) * (_THETA_MAX / theta)


# ---------------------------------------------------------------------------
# RoaringBitmap 32-bit — portable serialization
# ---------------------------------------------------------------------------

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096  # cardinality above this -> bitmap container


def rbm32_serialize(values) -> bytes:
    """Serialize a collection of uint32 values in the portable no-run
    layout (cookie 12346): cookie, container count, descriptive header
    (key, card-1), offset header, then array (sorted u16) or bitmap
    (1024×u64) containers."""
    vals = np.unique(np.asarray(list(values) if not isinstance(values, np.ndarray) else values, dtype=np.uint32))
    highs = (vals >> np.uint32(16)).astype(np.uint32)
    lows = (vals & np.uint32(0xFFFF)).astype(np.uint16)
    keys, starts = np.unique(highs, return_index=True)
    bounds = list(starts) + [len(vals)]
    n = len(keys)
    desc = bytearray()
    payloads = []
    for i in range(n):
        lo = lows[bounds[i] : bounds[i + 1]]
        card = len(lo)
        desc += struct.pack("<HH", int(keys[i]), card - 1)
        if card <= _ARRAY_MAX:
            payloads.append(lo.tobytes())
        else:
            bits = np.zeros(1024, dtype=np.uint64)
            idx = lo.astype(np.uint32)
            np.bitwise_or.at(bits, idx >> np.uint32(6), np.uint64(1) << (idx & np.uint32(63)).astype(np.uint64))
            payloads.append(bits.tobytes())
    header = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    base = len(header) + len(desc) + 4 * n
    offsets = bytearray()
    pos = base
    for p in payloads:
        offsets += struct.pack("<I", pos)
        pos += len(p)
    return header + bytes(desc) + bytes(offsets) + b"".join(payloads)


def rbm32_deserialize(data: bytes) -> np.ndarray:
    """-> sorted uint32 ndarray. Reads both cookies (12346 no-run and
    12347 with run containers) per the RoaringFormatSpec."""
    data = bytes(data)
    (cookie32,) = struct.unpack_from("<I", data, 0)
    cookie = cookie32 & 0xFFFF
    off = 4
    if cookie == _SERIAL_COOKIE:
        n = (cookie32 >> 16) + 1
        nbytes_flags = (n + 7) // 8
        run_flags = data[off : off + nbytes_flags]
        off += nbytes_flags
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", data, off)
        off += 4
        run_flags = b"\x00" * ((n + 7) // 8)
    else:
        raise ValueError(f"not a portable roaring bitmap (cookie {cookie})")
    keys = np.empty(n, dtype=np.uint32)
    cards = np.empty(n, dtype=np.int64)
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", data, off)
        keys[i], cards[i] = k, cm1 + 1
        off += 4
    if cookie == _SERIAL_COOKIE_NO_RUN or n >= _NO_OFFSET_THRESHOLD:
        off += 4 * n  # offset header (recomputable; containers follow in order)
    out = []
    for i in range(n):
        is_run = run_flags[i // 8] & (1 << (i % 8))
        base = np.uint32(keys[i]) << np.uint32(16)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, off)
            off += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", data, off)
                off += 4
                lo = np.arange(start, start + length_m1 + 1, dtype=np.uint32)
                out.append(base + lo)
        elif cards[i] <= _ARRAY_MAX:
            lo = np.frombuffer(data, dtype=np.uint16, count=int(cards[i]), offset=off)
            off += 2 * int(cards[i])
            out.append(base + lo.astype(np.uint32))
        else:
            bits = np.frombuffer(data, dtype=np.uint64, count=1024, offset=off)
            off += 8192
            lo = np.flatnonzero(np.unpackbits(bits.view(np.uint8), bitorder="little"))
            out.append(base + lo.astype(np.uint32))
    if not out:
        return np.empty(0, dtype=np.uint32)
    return np.sort(np.concatenate(out)).astype(np.uint32)


def rbm32_union(bitmaps) -> bytes:
    parts = [rbm32_deserialize(b) for b in bitmaps if b is not None]
    if not parts:
        return rbm32_serialize(np.empty(0, dtype=np.uint32))
    return rbm32_serialize(np.unique(np.concatenate(parts)))


# ---------------------------------------------------------------------------
# RoaringBitmap 64-bit — portable layout (u64 bucket count, then per
# bucket: u32 high half + embedded 32-bit portable bitmap)
# ---------------------------------------------------------------------------


def rbm64_serialize(values) -> bytes:
    vals = np.unique(np.asarray(list(values) if not isinstance(values, np.ndarray) else values, dtype=np.uint64))
    highs = (vals >> np.uint64(32)).astype(np.uint64)
    lows = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    keys, starts = np.unique(highs, return_index=True)
    bounds = list(starts) + [len(vals)]
    out = [struct.pack("<Q", len(keys))]
    for i in range(len(keys)):
        out.append(struct.pack("<I", int(keys[i]) & 0xFFFFFFFF))
        out.append(rbm32_serialize(lows[bounds[i] : bounds[i + 1]]))
    return b"".join(out)


def _rbm32_consumed(data: bytes, off: int) -> int:
    """Byte length of the 32-bit bitmap starting at ``off``."""
    (cookie32,) = struct.unpack_from("<I", data, off)
    cookie = cookie32 & 0xFFFF
    pos = off + 4
    if cookie == _SERIAL_COOKIE:
        n = (cookie32 >> 16) + 1
        nbytes_flags = (n + 7) // 8
        run_flags = data[pos : pos + nbytes_flags]
        pos += nbytes_flags
    else:
        (n,) = struct.unpack_from("<I", data, pos)
        pos += 4
        run_flags = b"\x00" * ((n + 7) // 8)
    cards = []
    for i in range(n):
        _, cm1 = struct.unpack_from("<HH", data, pos)
        cards.append(cm1 + 1)
        pos += 4
    if cookie == _SERIAL_COOKIE_NO_RUN or n >= _NO_OFFSET_THRESHOLD:
        pos += 4 * n
    for i in range(n):
        if run_flags[i // 8] & (1 << (i % 8)):
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2 + 4 * n_runs
        elif cards[i] <= _ARRAY_MAX:
            pos += 2 * cards[i]
        else:
            pos += 8192
    return pos - off


def rbm64_deserialize(data: bytes) -> np.ndarray:
    data = bytes(data)
    (n_buckets,) = struct.unpack_from("<Q", data, 0)
    off = 8
    out = []
    for _ in range(n_buckets):
        (high,) = struct.unpack_from("<I", data, off)
        off += 4
        ln = _rbm32_consumed(data, off)
        lows = rbm32_deserialize(data[off : off + ln])
        off += ln
        out.append((np.uint64(high) << np.uint64(32)) + lows.astype(np.uint64))
    if not out:
        return np.empty(0, dtype=np.uint64)
    return np.sort(np.concatenate(out)).astype(np.uint64)


def rbm64_union(bitmaps) -> bytes:
    parts = [rbm64_deserialize(b) for b in bitmaps if b is not None]
    if not parts:
        return rbm64_serialize(np.empty(0, dtype=np.uint64))
    return rbm64_serialize(np.unique(np.concatenate(parts)))


def rbm_cardinality(data: bytes, bits: int = 32) -> int:
    return len(rbm32_deserialize(data) if bits == 32 else rbm64_deserialize(data))


# ---------------------------------------------------------------------------
# DataSketches HLL (HyperLogLog) — the serialized layout Spark's
# hll_sketch_agg / hll_union_agg functions read and write
# (datasketches-java hll/PreambleUtil.java, serVer 1, family HLL=7).
# Three storage modes: LIST (few coupons, appended), SET (coupon hash
# set), HLL (dense register array; Spark always targets HLL_8 — one
# byte per register). A coupon packs (26-bit slot address, 6-bit
# value); folding to 2^lgK slots is ``slot = coupon & (K-1)`` with the
# value untouched, so unions across lgKs are exact downsamples.
# The union result carries the OUT_OF_ORDER flag and recomputed
# kxq0/kxq1/curMin/numAtCurMin so readers use the composite estimator
# (HIP cannot survive a union — same as datasketches-java Union).
# ---------------------------------------------------------------------------

_HLL_FAMILY = 7
# flags byte bits (hll/PreambleUtil.java)
_HLL_F_EMPTY = 4
_HLL_F_COMPACT = 8
_HLL_F_OOO = 16
_HLL_F_READONLY = 2


def hll_parse(buf: bytes) -> tuple[int, str, np.ndarray]:
    """-> (lgK, mode, payload): mode 'coupons' (LIST/SET, payload =
    int64 coupon array) or 'hll8' (payload = uint8 registers)."""
    b = bytes(buf)
    if len(b) < 8:
        raise ValueError("HLL sketch buffer too short")
    pre_ints, ser_ver, fam, lgk, lg_arr, flags, b6, mode_byte = b[:8]
    if fam != _HLL_FAMILY or ser_ver != 1:
        raise ValueError(f"not a DataSketches HLL sketch (family={fam}, serVer={ser_ver})")
    cur_mode = mode_byte & 3
    tgt = (mode_byte >> 2) & 3
    if flags & _HLL_F_EMPTY:
        return lgk, "coupons", np.empty(0, dtype=np.int64)
    if cur_mode == 0:  # LIST: b6 = listCount, coupons from offset 8
        n = b6
        arr = np.frombuffer(b, dtype="<u4", count=n, offset=8).astype(np.int64)
        return lgk, "coupons", arr[arr != 0]
    if cur_mode == 1:  # SET: count at bytes 8-12
        n = struct.unpack_from("<i", b, 8)[0]
        if flags & _HLL_F_COMPACT:
            arr = np.frombuffer(b, dtype="<u4", count=n, offset=12).astype(np.int64)
        else:  # updatable: full 2^lgArr hash array, zero = empty slot
            arr = np.frombuffer(b, dtype="<u4", count=1 << lg_arr, offset=12).astype(np.int64)
        return lgk, "coupons", arr[arr != 0]
    if cur_mode == 2:
        if tgt != 2:
            raise NotImplementedError("only HLL_8 dense sketches are supported (Spark's target)")
        k = 1 << lgk
        return lgk, "hll8", np.frombuffer(b, dtype=np.uint8, count=k, offset=40).copy()
    raise ValueError(f"unknown HLL curMode {cur_mode}")


def _hll_coupon_regs(coupons: np.ndarray, lgk: int) -> np.ndarray:
    regs = np.zeros(1 << lgk, dtype=np.uint8)
    if len(coupons):
        # low 26 bits = slot address at max precision; lgK <= 21 < 26
        # always, so folding to 2^lgK needs only the lgK-bit mask
        slots = (coupons & ((1 << lgk) - 1)).astype(np.int64)
        vals = ((coupons >> 26) & 0x3F).astype(np.uint8)
        np.maximum.at(regs, slots, vals)
    return regs


def _hll_downsample(regs: np.ndarray, lgk_src: int, lgk_dst: int) -> np.ndarray:
    """Fold a 2^src register array to 2^dst: slot_dst = slot_src mod
    K_dst; value untouched (slot and value bits are independent)."""
    if lgk_src == lgk_dst:
        return regs
    return regs.reshape(1 << (lgk_src - lgk_dst), 1 << lgk_dst).max(axis=0)


def _hll_serialize_set(lgk: int, coupons: np.ndarray) -> bytes:
    """Compact SET-mode buffer (coupon union below promotion size):
    12-byte header + couponCount packed coupons."""
    n = len(coupons)
    lg_arr = 5
    while (1 << lg_arr) * 3 // 4 < n:
        lg_arr += 1
    flags = _HLL_F_COMPACT | _HLL_F_READONLY | (0 if n else _HLL_F_EMPTY)
    hdr = bytes([3, 1, _HLL_FAMILY, lgk, lg_arr, flags, 0, (2 << 2) | 1])
    return hdr + struct.pack("<i", n) + coupons.astype("<u4").tobytes()


def _hll_serialize_hll8(lgk: int, regs: np.ndarray) -> bytes:
    """Updatable HLL_8 buffer with the composite-estimator state
    recomputed from the registers (OUT_OF_ORDER set, hipAccum unused)."""
    cur_min = int(regs.min())
    num_at_cur_min = int((regs == cur_min).sum())
    pow2 = np.ldexp(1.0, -regs.astype(np.int64))
    kxq0 = float(pow2[regs < 32].sum())
    kxq1 = float(pow2[regs >= 32].sum())
    hdr = bytes([10, 1, _HLL_FAMILY, lgk, 0, _HLL_F_OOO, cur_min, (2 << 2) | 2])
    hdr += struct.pack("<d", 0.0)  # hipAccum: invalid after union
    hdr += struct.pack("<d", kxq0)
    hdr += struct.pack("<d", kxq1)
    hdr += struct.pack("<ii", num_at_cur_min, 0)  # auxCount=0 (HLL_8 has no aux)
    return hdr + regs.astype(np.uint8).tobytes()


def hll_union(bufs) -> bytes:
    """Union serialized DataSketches HLL sketches (the FieldHllSketchAgg
    contract; byte-compatible with Spark's hll_union_agg). Coupon-mode
    inputs whose merged coupon set stays below the promotion bound are
    re-emitted in SET mode (estimates stay coupon-exact); otherwise the
    result is a dense HLL_8 array at the smallest input lgK."""
    parsed = [hll_parse(b) for b in bufs if b is not None and len(bytes(b)) >= 8]
    parsed = [(lgk, m, p) for lgk, m, p in parsed if len(p)]
    if not parsed:
        return bytes([2, 1, _HLL_FAMILY, 12, 3, _HLL_F_EMPTY | _HLL_F_COMPACT | _HLL_F_READONLY, 0, 2 << 2])
    # Java downsamples to the MIN lgK across ALL inputs (coupon-mode
    # sketches carry lgConfigK too — verified empirically against
    # hll_union_agg: LIST(lgK=4) ∪ LIST(lgK=12) → lgK=4)
    lgk = min(p[0] for p in parsed)
    dense = [p for p in parsed if p[1] == "hll8"]
    if not dense:
        coupons = np.unique(np.concatenate([p[2] for p in parsed]))
        # SET→HLL promotion at count > 0.75 * 2^(lgK-3), matching
        # datasketches-java (verified: 384 coupons stay SET at lgK=12,
        # 385 promote) so estimates stay mode-identical to Java's union
        if len(coupons) <= (3 * (1 << (lgk - 3))) // 4:
            return _hll_serialize_set(lgk, coupons)
    regs = np.zeros(1 << lgk, dtype=np.uint8)
    for src_lgk, mode, payload in parsed:
        if mode == "hll8":
            regs = np.maximum(regs, _hll_downsample(payload, src_lgk, lgk))
        else:
            regs = np.maximum(regs, _hll_coupon_regs(payload, lgk))
    return _hll_serialize_hll8(lgk, regs)


def hll_estimate(buf: bytes) -> float:
    """Composite HLL estimate (for tests; Spark's hll_sketch_estimate
    is the production reader). Coupon modes count exactly via the
    coupon-collector bijection; dense uses the raw harmonic-mean HLL
    estimator with the low-range coupon-collector correction."""
    import math

    lgk, mode, payload = hll_parse(buf)
    if mode == "coupons":
        # CubicInterpolation over the coupon-mapping table in java; for
        # small counts the identity is within float noise of exact
        return float(len(payload))
    k = 1 << lgk
    regs = payload
    num_zero = int((regs == 0).sum())
    raw = (0.8365925 * k * k) / float(np.ldexp(1.0, -regs.astype(np.int64)).sum())
    if num_zero and raw <= 2.5 * k:
        return k * math.log(k / num_zero)  # linear counting
    return raw
