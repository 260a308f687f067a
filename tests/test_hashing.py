"""Unit oracles for the fused hashing primitives: the streamed/fused
implementations must be bit-identical to the naive serial formulations
(the serial paths also feed the committed golden parquets)."""

import numpy as np
import pytest

from frizbee_spark.functions import hashing as H


def _naive_minhash(data: bytes, k: int, a, b):
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) < k:
        return np.full(len(a), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    h = H.hash_shingles(arr, k)
    return H.minhash_signature(np.unique(h), a, b)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_minhash_docs_stream_matches_serial(seed):
    rng = np.random.RandomState(seed)
    texts = []
    for _ in range(200):
        n = int(rng.choice([0, 2, 4, 5, 37, 300, 5000]))
        texts.append(bytes(rng.randint(32, 127, size=n, dtype=np.int32).astype(np.uint8)))
    payload = b"".join(texts)
    data = np.frombuffer(payload, dtype=np.uint8)
    offsets = np.cumsum([0] + [len(t) for t in texts]).astype(np.int64)
    a, b = H.minhash_params(64, 7)
    k = 5
    valid = (offsets[1:] - offsets[:-1]) >= k

    out = np.full((len(texts), 64), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    H.minhash_docs_stream(data, offsets, valid, k, a, b, out, chunk_windows=512)

    for i, t in enumerate(texts):
        expected = _naive_minhash(t, k, a, b)
        assert np.array_equal(out[i], expected), i


def test_minhash_docs_stream_huge_doc_gets_own_chunk():
    rng = np.random.RandomState(3)
    texts = [b"small one here", bytes(rng.randint(32, 127, size=20000, dtype=np.int32).astype(np.uint8)), b"tail doc x"]
    payload = b"".join(texts)
    data = np.frombuffer(payload, dtype=np.uint8)
    offsets = np.cumsum([0] + [len(t) for t in texts]).astype(np.int64)
    a, b = H.minhash_params(16, 11)
    valid = (offsets[1:] - offsets[:-1]) >= 5
    out = np.full((3, 16), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    H.minhash_docs_stream(data, offsets, valid, 5, a, b, out, chunk_windows=256)
    for i, t in enumerate(texts):
        assert np.array_equal(out[i], _naive_minhash(t, 5, a, b))


def test_simhash64_matches_bit_loop():
    rng = np.random.RandomState(5)
    for n in (1, 2, 63, 64, 65, 1000):
        hashes = rng.randint(0, 2**63, size=n, dtype=np.int64).astype(np.uint64)
        got = H.simhash64(hashes)
        # naive sign-sum bit loop
        bits = (
            (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        ).astype(np.int64)
        sums = (2 * bits - 1).sum(axis=0)
        want = np.uint64(0)
        for i in range(64):
            if sums[i] > 0:
                want |= np.uint64(1) << np.uint64(i)
        assert got == want, n
    assert H.simhash64(np.empty(0, dtype=np.uint64)) == np.uint64(0)


def _naive_simhash(data: bytes, k: int) -> int:
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) < k:
        return 0
    sh = np.unique(H.hash_shingles(arr, k))
    return int(np.int64(H.simhash64(sh).astype(np.int64)))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_simhash_docs_stream_matches_serial(seed):
    rng = np.random.RandomState(seed)
    texts = []
    for _ in range(200):
        n = int(rng.choice([0, 2, 4, 5, 37, 300, 5000]))
        texts.append(bytes(rng.randint(32, 127, size=n, dtype=np.int32).astype(np.uint8)))
    texts.append(b"aaaaaaaaaaaaaaaaaaaa")  # all-duplicate shingles
    payload = b"".join(texts)
    data = np.frombuffer(payload, dtype=np.uint8)
    offsets = np.cumsum([0] + [len(t) for t in texts]).astype(np.int64)
    k = 5
    valid = (offsets[1:] - offsets[:-1]) >= k

    out = np.zeros(len(texts), dtype=np.int64)
    H.simhash_docs_stream(data, offsets, valid, k, out, chunk_windows=512)

    for i, t in enumerate(texts):
        assert int(out[i]) == _naive_simhash(t, k), i


def test_simhash_docs_stream_huge_doc_gets_own_chunk():
    rng = np.random.RandomState(3)
    texts = [
        b"small one here",
        bytes(rng.randint(32, 127, size=20000, dtype=np.int32).astype(np.uint8)),
        b"tail doc x",
    ]
    payload = b"".join(texts)
    data = np.frombuffer(payload, dtype=np.uint8)
    offsets = np.cumsum([0] + [len(t) for t in texts]).astype(np.int64)
    valid = (offsets[1:] - offsets[:-1]) >= 5
    out = np.zeros(3, dtype=np.int64)
    H.simhash_docs_stream(data, offsets, valid, 5, out, chunk_windows=256)
    for i, t in enumerate(texts):
        assert int(out[i]) == _naive_simhash(t, 5)
    # retention cap: the 20k-window doc must not leave its buffer pinned
    for name in ("h", "t"):
        buf = H._MINHASH_SCRATCH.get(name)
        assert buf is None or len(buf) <= 4 * 256 * 4  # pow2 rounding slack


def test_minhash_scratch_retention_cap():
    rng = np.random.RandomState(9)
    big = bytes(rng.randint(32, 127, size=300000, dtype=np.int32).astype(np.uint8))
    data = np.frombuffer(big, dtype=np.uint8)
    offsets = np.array([0, len(big)], dtype=np.int64)
    a, b = H.minhash_params(8, 13)
    out = np.full((1, 8), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    H.minhash_docs_stream(
        data, offsets, np.array([True]), 5, a, b, out, chunk_windows=1 << 10
    )
    assert np.array_equal(out[0], _naive_minhash(big, 5, a, b))
    for name in ("h", "t"):
        buf = H._MINHASH_SCRATCH.get(name)
        assert buf is None or len(buf) <= 4 * (1 << 10)
