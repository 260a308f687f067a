"""Deterministic vectorized hashing primitives shared by the dedup stages.

All hashing is seed-deterministic numpy uint64 arithmetic (splitmix64 /
multiply-shift universal hashing) — no Python `hash()`, no runtime entropy —
so signatures are reproducible across executors, sessions, and cluster
sizes (north_rule: deterministic seeds for all hashing)."""

from __future__ import annotations

import sys

import numpy as np

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 arrays (public-domain constant mix)."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
        return x ^ (x >> np.uint64(31))


def hash_shingles(data: np.ndarray, k: int, _chunk: int = 1 << 13) -> np.ndarray:
    """Rolling char k-shingle hashes of a uint8 byte array.

    Returns uint64 hashes of every k-byte window (len-k+1 values) via a
    polynomial rolling base then splitmix64 finalization; empty when the
    text is shorter than k. Inputs larger than `_chunk` windows are
    processed in overlapping segments so the uint64 intermediates stay
    cache-resident — callers hash whole Arrow-batch buffers (tens of MB)
    in one call, and an unchunked pass would stream ~10x the buffer size
    through DRAM per temporary, which stops scaling with worker count."""
    n = len(data)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    m = n - k + 1
    if m <= _chunk:
        return _hash_windows(data, k, m)
    out = np.empty(m, dtype=np.uint64)
    for s in range(0, m, _chunk):
        e = min(s + _chunk, m)
        out[s:e] = _hash_windows(data[s : e + k - 1], k, e - s)
    return out


def _hash_windows(data: np.ndarray, k: int, m: int) -> np.ndarray:
    """One chunk of rolling hashes, fully in-place: acc + one temp buffer
    (~2 x 8 x chunk bytes) stay L2-resident, so 32 concurrent workers do
    not fight for DRAM — this machine sustains ~10 GB/s total, and the
    out-of-place formulation (~40B of traffic per input byte) made the
    whole stage memory-bound instead of compute-bound."""
    base = np.uint64(0x100000001B3)  # FNV prime as polynomial base
    acc = np.zeros(m, dtype=np.uint64)
    tmp = np.empty(m, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            acc *= base
            acc += data[i : m + i]
        # splitmix64 finalizer, in place (identical to splitmix64())
        acc += np.uint64(0x9E3779B97F4A7C15)
        np.right_shift(acc, np.uint64(30), out=tmp)
        acc ^= tmp
        acc *= np.uint64(0xBF58476D1CE4E5B9)
        np.right_shift(acc, np.uint64(27), out=tmp)
        acc ^= tmp
        acc *= np.uint64(0x94D049BB133111EB)
        np.right_shift(acc, np.uint64(31), out=tmp)
        acc ^= tmp
    return acc


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) multiply-shift parameters for `num_perm` permutations."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)
    a |= np.uint64(1)  # odd multipliers
    b = rng.randint(0, 2**62, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature(
    shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray, block: int = 16
) -> np.ndarray:
    """Min over multiply-shift-permuted shingle hashes: (num_perm,) uint64.

    Permutations are processed in blocks of `block` so the (block, n)
    intermediate stays cache-resident (~300KB at n~2300) instead of
    materializing the full (num_perm, n) matrix (~2.3MB/doc). With 32
    executor workers hashing concurrently the full matrix saturates DRAM
    bandwidth and the stage stops scaling with cores; the blocked form is
    bit-identical (same wrap-around arithmetic) and memory-bound only on
    the shingle array, which fits L2.

    An empty shingle set hashes to all-max (never collides with real docs)."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), _MASK64, dtype=np.uint64)
    out = np.empty(len(a), dtype=np.uint64)
    sh = shingle_hashes[None, :]
    with np.errstate(over="ignore"):
        for s in range(0, len(a), block):
            e = min(s + block, len(a))
            permuted = a[s:e, None] * sh
            permuted += b[s:e, None]
            out[s:e] = permuted.min(axis=1)
    return out


#: per-process scratch buffers for the fused minhash stream — reused across
#: batches AND tasks (python workers are long-lived), so steady-state the
#: worker touches the same few hundred KB instead of allocating ~50MB of
#: fresh pages per batch. On this sandbox VM, first-touch faults on large
#: fresh allocations are intermittently ~100x slower than warm memory
#: (host-side paging); on a real cluster the same reuse removes page-zeroing
#: and TLB churn from the hot loop.
_MINHASH_SCRATCH: dict = {}


def minhash_docs_stream(
    data: np.ndarray,
    offsets: np.ndarray,
    valid: np.ndarray,
    k: int,
    a: np.ndarray,
    b: np.ndarray,
    out: np.ndarray,
    chunk_windows: int = 1 << 15,
) -> None:
    """Fused shingle-hash + MinHash over a batch of documents laid out in
    one utf-8 byte buffer (`offsets[i]..offsets[i+1]` per doc), writing
    signatures into `out[(n_docs, num_perm)]`.

    Processing is doc-chunked: each chunk's rolling k-shingle hashes are
    written into a REUSED scratch buffer (`_MINHASH_SCRATCH`), then every
    permutation is one 1-D multiply-add over the chunk plus a per-doc
    `np.minimum.reduceat`. Bit-identical to hashing the whole buffer and
    reducing per doc (window hashes are a pure function of window bytes;
    min over a multiset equals min over its set), but the working set
    stays cache-resident and no large buffer is ever allocated per batch.
    Invalid docs must be pre-filled with the all-ones sentinel."""
    n = len(valid)
    num_perm = len(a)
    starts = offsets[:-1]
    widths = np.maximum(offsets[1:] - starts - (k - 1), 0)
    widths = np.where(valid, widths, 0)
    base = np.uint64(0x100000001B3)

    def buf(name: str, size: int, dtype=np.uint64) -> np.ndarray:
        cur = _MINHASH_SCRATCH.get(name)
        if cur is None or len(cur) < size or cur.dtype != dtype:
            cap = 1 << max(10, int(np.ceil(np.log2(max(1, size)))))
            cur = np.empty(cap, dtype=dtype)
            _MINHASH_SCRATCH[name] = cur
        return cur

    i = 0
    with np.errstate(over="ignore"):
        while i < n:
            j = i
            total = 0
            while j < n:
                w = int(widths[j])
                if total > 0 and total + w > chunk_windows:
                    break
                total += w
                j += 1
            vd = np.flatnonzero(widths[i:j]) + i
            if len(vd) == 0:
                i = j
                continue
            hbuf = buf("h", total)
            tmp = buf("t", total)
            bounds = np.zeros(len(vd), dtype=np.int64)
            np.cumsum(widths[vd[:-1]], out=bounds[1:])
            _pack_rolling_hashes(data, starts, widths, vd, bounds, k, hbuf, tmp)
            mins = np.empty((num_perm, len(vd)), dtype=np.uint64)
            hview = hbuf[:total]
            tview = tmp[:total]
            for p in range(num_perm):
                np.multiply(hview, a[p], out=tview)
                tview += b[p]
                mins[p] = np.minimum.reduceat(tview, bounds)
            out[vd] = mins.T
            i = j
    # retention cap: a single document larger than chunk_windows gets its
    # own chunk (bypassing the cap), growing the scratch buffers to its
    # window count — and python workers are long-lived, so one pathological
    # multi-MB doc would otherwise pin that allocation in every worker that
    # saw it, forever (ADVICE r3). Buffers beyond 4x the chunk size are
    # dropped after the batch; the steady-state (<= chunk-sized) buffers
    # stay cached, which is all the first-touch-fault fix needs.
    cap = 4 * chunk_windows
    for name in ("h", "t", "pack_h", "pack_t", "pack_i"):
        cur = _MINHASH_SCRATCH.get(name)
        if cur is not None and len(cur) > cap:
            del _MINHASH_SCRATCH[name]


def _scratch_buf(name: str, size: int, dtype=np.uint64) -> np.ndarray:
    """Power-of-two-capacity reusable scratch from `_MINHASH_SCRATCH`."""
    cur = _MINHASH_SCRATCH.get(name)
    if cur is None or len(cur) < size or cur.dtype != dtype:
        cap = 1 << max(10, int(np.ceil(np.log2(max(1, size)))))
        cur = np.empty(cap, dtype=dtype)
        _MINHASH_SCRATCH[name] = cur
    return cur


def _pack_rolling_hashes(
    data: np.ndarray,
    starts: np.ndarray,
    widths: np.ndarray,
    vd: np.ndarray,
    bounds: np.ndarray,
    k: int,
    hbuf: np.ndarray,
    tmp: np.ndarray,
) -> None:
    """Rolling k-shingle hashes of each doc in `vd`, packed contiguously
    into `hbuf` at `bounds` offsets. Identical arithmetic to
    `hash_shingles` (polynomial base + in-place splitmix64 finalizer).

    Vectorized across the chunk (round 6): the old per-doc slice loop was
    interpreter-overhead-bound at ~300-char docs (~10 numpy calls on a
    ~300-element view per doc). Now EVERY window of the chunk's contiguous
    byte span is hashed in one pass — windows straddling doc boundaries
    are computed too (a few % extra arithmetic) but never selected — and
    one fancy-index gather packs the valid per-doc windows into `hbuf`.
    A window hash is a pure function of its k bytes, so the result is
    bit-identical to the per-doc form (pinned by the *_matches_serial
    kernel tests)."""
    base = np.uint64(0x100000001B3)
    lo = int(starts[vd[0]])
    hi = int(starts[vd[-1]] + widths[vd[-1]]) + k - 1
    span = data[lo:hi]
    m_all = len(span) - k + 1
    total = int(bounds[-1] + widths[vd[-1]])
    acc = _scratch_buf("pack_h", m_all)[:m_all]
    t2 = _scratch_buf("pack_t", m_all)[:m_all]
    with np.errstate(over="ignore"):
        acc.fill(0)
        for kk in range(k):
            acc *= base
            acc += span[kk : m_all + kk]
        # splitmix64 finalizer in place (identical to splitmix64())
        acc += np.uint64(0x9E3779B97F4A7C15)
        np.right_shift(acc, np.uint64(30), out=t2)
        acc ^= t2
        acc *= np.uint64(0xBF58476D1CE4E5B9)
        np.right_shift(acc, np.uint64(27), out=t2)
        acc ^= t2
        acc *= np.uint64(0x94D049BB133111EB)
        np.right_shift(acc, np.uint64(31), out=t2)
        acc ^= t2
        # gather: packed position bounds[d] + j maps to span window
        # (starts[d] - lo) + j
        idx = _scratch_buf("pack_i", total, np.int64)[:total]
        idx[:] = np.arange(total, dtype=np.int64)
        idx += np.repeat((starts[vd] - lo) - bounds, widths[vd])
        np.take(acc, idx, out=hbuf[:total])


def simhash_docs_stream(
    data: np.ndarray,
    offsets: np.ndarray,
    valid: np.ndarray,
    k: int,
    out: np.ndarray,
    chunk_windows: int = 1 << 15,
) -> None:
    """Fused shingle-hash + SimHash over a batch of documents laid out in
    one utf-8 byte buffer, writing 64-bit SimHashes into `out[(n_docs,)]`
    (int64; invalid docs must be pre-filled with 0).

    Bit-identical to `simhash64(np.unique(hash_shingles(doc, k)))` per doc
    but with no per-document Python pass: each chunk packs its docs'
    rolling hashes into the shared scratch buffers, ONE argsort over
    (doc-segment, hash) gives per-doc sorted order, a diff mask drops
    duplicate shingles, and the per-bit majorities come from a single
    np.unpackbits + add.reduceat over the de-duplicated chunk — the same
    sort/reduceat-across-the-chunk shape `minhash_docs_stream` uses
    (VERDICT r3: the per-doc np.unique + simhash64 loop was the last
    remaining interpreter-bound dedup stage)."""
    n = len(valid)
    starts = offsets[:-1]
    widths = np.maximum(offsets[1:] - starts - (k - 1), 0)
    widths = np.where(valid, widths, 0)

    def buf(name: str, size: int, dtype=np.uint64) -> np.ndarray:
        cur = _MINHASH_SCRATCH.get(name)
        if cur is None or len(cur) < size or cur.dtype != dtype:
            cap = 1 << max(10, int(np.ceil(np.log2(max(1, size)))))
            cur = np.empty(cap, dtype=dtype)
            _MINHASH_SCRATCH[name] = cur
        return cur

    i = 0
    while i < n:
        j = i
        total = 0
        while j < n:
            w = int(widths[j])
            if total > 0 and total + w > chunk_windows:
                break
            total += w
            j += 1
        vd = np.flatnonzero(widths[i:j]) + i
        if len(vd) == 0:
            i = j
            continue
        hbuf = buf("h", total)
        tmp = buf("t", total)
        bounds = np.zeros(len(vd), dtype=np.int64)
        np.cumsum(widths[vd[:-1]], out=bounds[1:])
        _pack_rolling_hashes(data, starts, widths, vd, bounds, k, hbuf, tmp)
        hview = hbuf[:total]
        # per-doc segment labels for every window, then one sort that
        # groups by doc and orders by hash within the doc
        seg_lens = widths[vd]
        doc_of = np.repeat(np.arange(len(vd), dtype=np.int64), seg_lens)
        order = np.lexsort((hview, doc_of))
        h_sorted = hview[order]
        d_sorted = doc_of[order]
        keep = np.empty(total, dtype=bool)
        keep[0] = True
        np.not_equal(h_sorted[1:], h_sorted[:-1], out=keep[1:])
        keep[1:] |= d_sorted[1:] != d_sorted[:-1]
        h_u = h_sorted[keep]
        d_u = d_sorted[keep]
        seg_starts = np.flatnonzero(
            np.r_[True, d_u[1:] != d_u[:-1]] if len(d_u) else np.empty(0, dtype=bool)
        )
        n_unique = np.diff(np.r_[seg_starts, len(d_u)])
        h_c = np.ascontiguousarray(h_u)
        if sys.byteorder != "little":  # pragma: no cover
            h_c = h_c.byteswap()
        # per-bit majorities WITHOUT materializing an (m, 64) bit matrix:
        # np.add.reduceat along axis 0 of such a matrix strides the whole
        # width per element and measured ~100x slower than this
        # byte-histogram form. For each of the 8 bytes of the hash, one
        # bincount over (doc_index * 256 + byte_value) gives a per-doc
        # byte-value histogram; multiplying by the constant (256, 8)
        # bit-table turns it into per-doc per-bit counts. Bit-identical to
        # the unpackbits/reduceat formulation (pure integer counting).
        byte_view = h_c.view(np.uint8).reshape(len(h_c), 8)
        counts = np.empty((len(vd), 64), dtype=np.int64)
        base = d_u * np.int64(256)
        for bj in range(8):
            hist = np.bincount(
                base + byte_view[:, bj], minlength=len(vd) * 256
            ).reshape(-1, 256)
            counts[:, 8 * bj : 8 * bj + 8] = hist @ _BYTE_BIT_TABLE
        maj = (2 * counts > n_unique[:, None]).astype(np.uint8)
        vals = np.packbits(maj, axis=1, bitorder="little").view(np.uint64).ravel()
        out[vd[d_u[seg_starts]]] = vals.view(np.int64)
        i = j
    cap = 4 * chunk_windows
    for name in ("h", "t", "pack_h", "pack_t", "pack_i"):
        cur = _MINHASH_SCRATCH.get(name)
        if cur is not None and len(cur) > cap:
            del _MINHASH_SCRATCH[name]


#: (256, 8) little-endian bit table: _BYTE_BIT_TABLE[v, b] = bit b of byte v.
#: Multiplying a per-doc byte histogram by it yields per-doc per-bit counts
#: (the simhash majority accumulator).
_BYTE_BIT_TABLE = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1, bitorder="little"
).astype(np.int64)

_P64_1 = np.uint64(0x9E3779B185EBCA87)
_P64_2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P64_3 = np.uint64(0x165667B19E3779F9)
_P64_4 = np.uint64(0x85EBCA77C2B2AE63)
_P64_5 = np.uint64(0x27D4EB2F165667C5)


def _rotl64(x: np.ndarray, n: int) -> np.ndarray:
    n = np.uint64(n)
    return (x << n) | (x >> (np.uint64(64) - n))


def _xxh64_fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P64_2
    h = h ^ (h >> np.uint64(29))
    h = h * _P64_3
    h = h ^ (h >> np.uint64(32))
    return h


def _xxh64_long(value: np.ndarray, seed) -> np.ndarray:
    """XXH64 of one 8-byte word — the exact formula Spark's `xxhash64`
    expression applies per long column (XXH64.hashLong in the Spark
    sources; public xxHash spec). Vectorized over numpy uint64 arrays."""
    h = np.uint64(seed) + _P64_5 + np.uint64(8)
    h = np.broadcast_to(h, np.shape(value)).copy() if np.shape(value) else h
    k = _rotl64(np.asarray(value, dtype=np.uint64) * _P64_2, 31) * _P64_1
    h = h ^ k
    h = _rotl64(h, 27) * _P64_1 + _P64_4
    return _xxh64_fmix(h)


def spark_xxhash64_longs(columns: list[np.ndarray], seed: int = 42) -> np.ndarray:
    """Spark-compatible `F.xxhash64(long, long, ...)`: the hash of column
    i seeds the hash of column i+1, starting from Spark's default seed 42.
    Mirrors the JVM band-hash expression so serial golden oracles and the
    distributed LSH path agree bit-for-bit."""
    h = np.uint64(seed)
    with np.errstate(over="ignore"):
        for col in columns:
            h = _xxh64_long(np.asarray(col, dtype=np.uint64), h)
    return h


def band_hashes(signature: np.ndarray, num_bands: int) -> np.ndarray:
    """Hash each band (contiguous rows) of a signature into one uint64 —
    identical to the JVM lsh_bands expression: xxhash64(row_0..row_{r-1},
    band_id) chained with Spark's seed 42."""
    rows = len(signature) // num_bands
    bands = signature[: num_bands * rows].reshape(num_bands, rows)
    cols = [bands[:, r] for r in range(rows)]
    cols.append(np.arange(num_bands, dtype=np.uint64))
    return spark_xxhash64_longs(cols)


def simhash64(shingle_hashes: np.ndarray) -> np.uint64:
    """64-bit SimHash sign-sum over shingle hashes.

    Vectorized: per-bit counts come from np.unpackbits over the uint64
    hashes' little-endian byte view (bit i of the result is set iff more
    than half the shingles have bit i set — identical to the sign-sum
    formulation: sum of (2*bit-1) > 0 <=> 2*count_ones > n)."""
    if len(shingle_hashes) == 0:
        return np.uint64(0)
    n = len(shingle_hashes)
    h = np.ascontiguousarray(shingle_hashes, dtype=np.uint64)
    if sys.byteorder != "little":  # pragma: no cover
        h = h.byteswap()
    bits = np.unpackbits(h.view(np.uint8).reshape(n, 8), axis=1, bitorder="little")
    count_ones = bits.sum(axis=0, dtype=np.int64)
    majority = (2 * count_ones > n).astype(np.uint8)
    out = np.packbits(majority, bitorder="little").view(np.uint64)[0]
    return np.uint64(out)
