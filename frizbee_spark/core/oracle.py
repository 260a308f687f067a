"""Scalar reference oracle for frizbee-compatible Smith-Waterman scoring.

This module is the executable specification of the reference's scoring
semantics, transcribed from the SIMD-chunked recurrence so that scores are
byte-for-byte identical:

- ASCII SW:       /root/reference/src/smith_waterman/algo/ascii.rs:10-158
- gap scan:       /root/reference/src/smith_waterman/algo/ascii_gap.rs:11-105
- unicode SW:     /root/reference/src/smith_waterman/algo/unicode.rs:10-217
- unicode gaps:   /root/reference/src/smith_waterman/algo/unicode_gap.rs:106-236
- greedy (>1024): /root/reference/src/smith_waterman/greedy.rs:7-91
- traceback:      /root/reference/src/smith_waterman/alignment_iter.rs:108-181
- saturation:     /root/reference/src/smith_waterman/backend/scalar.rs:196-211
  (adds wrap, subtractions saturate at 0, all in u16)

The horizontal ("left") gap dependency is resolved by the same log-shift
max-plus scan the reference uses, chunked into LANES-wide pieces. The
reference asserts lane-width independence empirically
(src/smith_waterman/backend/tests/parity.rs), but rare cross-chunk gap
geometries DO diverge between narrow and wide lane counts (e.g. needle
"LPy" over "Ny/UwVXLl1BPYh/c/Oq:74s8q,uWy": 8-lane chunks give 20, wider
give 21; the compiled reference on AVX-512 hardware gives 21). We therefore
default to a single full-width chunk (next power of two >= haystack length),
which matches the widest-SIMD behavior of the reference on real hardware and
is differentially validated against the compiled reference binary.

Everything here is single-pair and intentionally simple — the vectorized
batch kernel in frizbee_spark.kernel is parity-tested against this oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .config import MAX_HAYSTACK_LEN, Scoring, U16_MAX

__all__ = [
    "case_needle",
    "case_needle_unicode",
    "match_greedy",
    "score_haystack",
    "score_haystack_indices",
    "has_alignment_path",
    "SWResult",
]

_U16 = np.uint16


def _ssub(a: np.ndarray, b) -> np.ndarray:
    """Lane-wise saturating subtraction at 0 (backend/scalar.rs:205-211)."""
    b_arr = np.asarray(b, dtype=_U16)
    return np.where(a >= b_arr, a - b_arr, np.uint16(0)).astype(_U16)


def _wadd(a: np.ndarray, b) -> np.ndarray:
    """Lane-wise wrapping u16 add (backend/scalar.rs:196-202)."""
    with np.errstate(over="ignore"):
        return (a + np.asarray(b, dtype=_U16)).astype(_U16)


def _shift_right(vec: np.ndarray, adj: np.ndarray, n: int) -> np.ndarray:
    """shift_right_padded::<n>: lane j takes vec[j-n], lanes < n take adj's top lanes
    (backend/scalar.rs:223-232)."""
    out = np.empty_like(vec)
    out[:n] = adj[len(adj) - n :]
    out[n:] = vec[: len(vec) - n]
    return out


def case_needle(needle: bytes, case_sensitive: bool) -> list[tuple[int, int]]:
    """Per-byte (original, opposite-case) pairs (prefilter/mod.rs:49-65)."""
    out = []
    for c in needle:
        if case_sensitive:
            out.append((c, c))
        elif ord("a") <= c <= ord("z"):
            out.append((c, c - 32))
        elif ord("A") <= c <= ord("Z"):
            out.append((c, c + 32))
        else:
            out.append((c, c))
    return out


@dataclass(frozen=True)
class UnicodeChar:
    """A needle codepoint with its opposite-case bytes (prefilter/mod.rs:21-47)."""

    chars: bytes
    flipped_chars: bytes
    length: int


def case_needle_unicode(needle: str, case_sensitive: bool) -> list[UnicodeChar]:
    """Per-codepoint case pairs; length-changing or multi-char folds are
    ignored (prefilter/mod.rs:71-96)."""
    out = []
    for c in needle:
        length = len(c.encode("utf-8"))
        flipped = c
        if not case_sensitive:
            if c.isupper():
                cand = c.lower()
            elif c.islower():
                cand = c.upper()
            else:
                cand = c
            if len(cand) == 1 and len(cand.encode("utf-8")) == length:
                flipped = cand
        out.append(
            UnicodeChar(
                chars=c.encode("utf-8"),
                flipped_chars=flipped.encode("utf-8"),
                length=length,
            )
        )
    return out


def _is_ascii_delim(b: int) -> bool:
    """ASCII non-alphanumeric (literal/algo.rs:328-330, ascii.rs:83-89)."""
    return b <= 127 and not (
        ord("a") <= b <= ord("z") or ord("A") <= b <= ord("Z") or ord("0") <= b <= ord("9")
    )


def match_greedy(
    needle: bytes,
    haystack: bytes,
    scoring: Scoring,
    case_sensitive: bool,
    include_prefix: bool,
) -> tuple[int, list[int]] | None:
    """Linear greedy fallback for haystacks > MAX_HAYSTACK_LEN
    (greedy.rs:7-91). Returns (score, matched indices in forward order) or
    None when some needle byte is never found in order."""
    pairs = case_needle(needle, case_sensitive)
    if len(pairs) > len(haystack):
        return None

    score = 0
    indices: list[int] = []
    hay_idx = 0
    delimiter_bonus_enabled = False
    prev_is_lower = False
    prev_is_delimiter = False

    for needle_idx, (orig, flipped) in enumerate(pairs):
        start_idx = hay_idx
        found = False
        while hay_idx <= (len(haystack) - len(pairs) + needle_idx):
            h = haystack[hay_idx]
            h_is_digit = ord("0") <= h <= ord("9")
            h_is_upper = ord("A") <= h <= ord("Z")
            h_is_lower = ord("a") <= h <= ord("z")
            h_is_delim = h <= 127 and not (h_is_lower or h_is_upper or h_is_digit)

            if not h_is_delim:
                delimiter_bonus_enabled = True

            if h != orig and h != flipped:
                prev_is_delimiter = delimiter_bonus_enabled and h_is_delim
                prev_is_lower = h_is_lower
                hay_idx += 1
                continue

            score = min(U16_MAX, score + scoring.match_score)
            if hay_idx != start_idx and needle_idx != 0:
                gap_len = min(max(0, hay_idx - start_idx - 1), U16_MAX)
                penalty = min(
                    U16_MAX,
                    scoring.gap_open_penalty
                    + min(U16_MAX, scoring.gap_extend_penalty * gap_len),
                )
                score = max(0, score - penalty)
            if h == orig:
                score = min(U16_MAX, score + scoring.matching_case_bonus)
            if h_is_upper and prev_is_lower:
                score = min(U16_MAX, score + scoring.capitalization_bonus)
            if include_prefix and hay_idx == 0:
                score = min(U16_MAX, score + scoring.prefix_bonus)
            if prev_is_delimiter and not h_is_delim:
                score = min(U16_MAX, score + scoring.delimiter_bonus)

            prev_is_delimiter = delimiter_bonus_enabled and h_is_delim
            prev_is_lower = h_is_lower
            indices.append(hay_idx)
            hay_idx += 1
            found = True
            break

        if not found:
            return None

    return score, indices


def _propagate_ascii_gaps(
    row: np.ndarray,
    adj_row: np.ndarray,
    match_mask: np.ndarray,
    adj_match_mask: np.ndarray,
    gap_open: int,
    gap_extend: int,
) -> np.ndarray:
    """Log-shift horizontal gap scan (ascii_gap.rs:11-43 generalized to any
    power-of-two lane count). `match_mask` masks are u16 0xFFFF/0."""
    lanes = len(row)
    gex = np.full(lanes, gap_extend, dtype=_U16)
    gop = np.full(lanes, gap_open, dtype=_U16)
    shift = 1
    while shift < lanes:
        shifted_row = _shift_right(row, adj_row, shift)
        shifted_mm = _shift_right(match_mask, adj_match_mask, shift)
        gap_penalty = _wadd(gex, gop & shifted_mm)
        decayed = _ssub(shifted_row, gap_penalty)
        row = np.maximum(row, decayed)
        gex = _wadd(gex, gex)
        shift *= 2
    return row


@dataclass
class SWResult:
    """Score plus the DP state needed for traceback."""

    score: int
    #: (rows+1, (chunks+1)*lanes) u16 score matrix incl. leading zero chunk
    matrix: np.ndarray | None
    #: same shape, u16 0xFFFF/0 match-mask matrix
    masks: np.ndarray | None
    lanes: int
    rows: int
    #: chunk count including the leading zero chunk
    haystack_chunks: int
    used_greedy: bool
    greedy_indices: list[int] | None = None


def _load_chunk(haystack: bytes, start: int, lanes: int, offset: int = 0) -> np.ndarray:
    """load_partial: lanes bytes from haystack[start+offset:], zero padded
    (backend/scalar.rs:77-85)."""
    out = np.zeros(lanes, dtype=np.uint8)
    lo = start + offset
    piece = haystack[lo : lo + lanes]
    out[: len(piece)] = np.frombuffer(piece, dtype=np.uint8)
    return out


def score_haystack(
    needle: bytes | str,
    haystack: bytes | str,
    scoring: Scoring | None = None,
    case_sensitive: bool = False,
    include_prefix: bool = True,
    unicode: bool = False,
    lanes: int | None = None,
    keep_matrix: bool = False,
) -> SWResult:
    """Score one haystack against one needle with frizbee's SW recurrence.

    Dispatches to the greedy scorer for haystacks > MAX_HAYSTACK_LEN
    (ascii.rs:11-21) and to the per-codepoint unicode path when requested
    (unicode.rs:10-217).
    """
    scoring = scoring or Scoring()
    needle_b = needle.encode("utf-8") if isinstance(needle, str) else needle
    hay_b = haystack.encode("utf-8") if isinstance(haystack, str) else haystack
    if lanes is None:
        # Full-width scan: matches the widest-available SIMD backend, which is
        # what the reference runs on real hardware (verified differentially
        # against the compiled reference — see tests/test_reference_differential.py)
        lanes = 8
        while lanes < len(hay_b):
            lanes *= 2

    if len(hay_b) > MAX_HAYSTACK_LEN:
        res = match_greedy(needle_b, hay_b, scoring, case_sensitive, include_prefix)
        score, indices = res if res is not None else (0, None)
        return SWResult(
            score=score,
            matrix=None,
            masks=None,
            lanes=lanes,
            rows=0,
            haystack_chunks=0,
            used_greedy=True,
            greedy_indices=indices,
        )

    if unicode:
        return _score_haystack_unicode(
            needle_b, hay_b, scoring, case_sensitive, include_prefix, lanes, keep_matrix
        )
    return _score_haystack_ascii(
        needle_b, hay_b, scoring, case_sensitive, include_prefix, lanes, keep_matrix
    )


def _haystack_chunk_feature_masks(
    chunk: np.ndarray,
    prev_is_lower: np.ndarray,
    prev_is_delim: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Capitalization / delimiter lane masks for one chunk (ascii.rs:64-95).

    Returns (cap_mask, delim_mask, is_lower, is_delim)."""
    is_upper = (chunk >= ord("A")) & (chunk <= ord("Z"))
    is_lower = (chunk >= ord("a")) & (chunk <= ord("z"))
    is_letter = is_upper | is_lower
    is_digit = (chunk >= ord("0")) & (chunk <= ord("9"))
    cap_mask = is_upper & _shift_right(is_lower, prev_is_lower, 1)
    is_delim = ~(is_letter | is_digit | (chunk > 127))
    prev_char_delim = _shift_right(is_delim, prev_is_delim, 1)
    delim_mask = prev_char_delim & ~is_delim
    return cap_mask, delim_mask, is_lower, is_delim


def _score_haystack_ascii(
    needle: bytes,
    haystack: bytes,
    scoring: Scoring,
    case_sensitive: bool,
    include_prefix: bool,
    lanes: int,
    keep_matrix: bool,
) -> SWResult:
    """ASCII per-byte path (ascii.rs:10-158)."""
    pairs = case_needle(needle, case_sensitive)
    rows = len(pairs)
    n_chunks = -(-len(haystack) // lanes)
    haystack_chunks = n_chunks + 1

    matrix = np.zeros((rows + 1, haystack_chunks * lanes), dtype=_U16)
    masks = np.zeros((rows + 1, haystack_chunks * lanes), dtype=_U16)

    gap_extend = scoring.gap_extend_penalty
    gap_open = max(0, scoring.gap_open_penalty - scoring.gap_extend_penalty)
    match_plus_mismatch = (scoring.match_score + scoring.mismatch_penalty) & U16_MAX

    prefix_vec = np.zeros(lanes, dtype=_U16)
    if include_prefix:
        prefix_vec[0] = scoring.prefix_bonus
    prev_is_delim = np.zeros(lanes, dtype=bool)
    prev_is_lower = np.zeros(lanes, dtype=bool)
    max_scores = np.zeros(lanes, dtype=_U16)

    needle_orig = np.array([p[0] for p in pairs], dtype=np.uint8)
    needle_flip = np.array([p[1] for p in pairs], dtype=np.uint8)

    row_scores = np.zeros(lanes, dtype=_U16)
    for c in range(n_chunks):
        col = c + 1
        chunk = _load_chunk(haystack, c * lanes, lanes)
        cap_mask, delim_mask, prev_is_lower, prev_is_delim = (
            _haystack_chunk_feature_masks(chunk, prev_is_lower, prev_is_delim)
        )
        bonuses = _wadd(
            _wadd(
                np.where(delim_mask, np.uint16(scoring.delimiter_bonus), np.uint16(0)),
                np.where(cap_mask, np.uint16(scoring.capitalization_bonus), np.uint16(0)),
            ),
            _wadd(prefix_vec, np.uint16(match_plus_mismatch)),
        )

        up_gap_mask = np.zeros(lanes, dtype=_U16)
        prev_row = np.zeros(lanes, dtype=_U16)
        row_scores = np.zeros(lanes, dtype=_U16)
        lo = col * lanes
        left_lo = (col - 1) * lanes
        for i in range(1, rows + 1):
            exact_mask = chunk == needle_orig[i - 1]
            match_bool = exact_mask | (chunk == needle_flip[i - 1])
            match_mask = np.where(match_bool, np.uint16(U16_MAX), np.uint16(0))
            exact_u16 = np.where(exact_mask, np.uint16(U16_MAX), np.uint16(0))

            diag = _shift_right(prev_row, matrix[i - 1, left_lo : left_lo + lanes], 1)
            diag = _wadd(diag, match_mask & bonuses)
            diag = _ssub(diag, scoring.mismatch_penalty)
            diag = _wadd(diag, exact_u16 & np.uint16(scoring.matching_case_bonus))

            up = _ssub(prev_row, gap_extend)
            up = _ssub(up, up_gap_mask & np.uint16(gap_open))

            row_scores = _propagate_ascii_gaps(
                np.maximum(diag, up),
                matrix[i, left_lo : left_lo + lanes],
                match_mask,
                masks[i, left_lo : left_lo + lanes],
                gap_open,
                gap_extend,
            )
            matrix[i, lo : lo + lanes] = row_scores
            masks[i, lo : lo + lanes] = match_mask
            prev_row = row_scores
            up_gap_mask = match_mask

        max_scores = np.maximum(max_scores, row_scores)
        prefix_vec = np.zeros(lanes, dtype=_U16)

    score = int(max_scores.max()) if rows > 0 else 0
    return SWResult(
        score=score,
        matrix=matrix if keep_matrix else None,
        masks=masks if keep_matrix else None,
        lanes=lanes,
        rows=rows,
        haystack_chunks=haystack_chunks,
        used_greedy=False,
    )


def _unicode_gap_step(
    row: np.ndarray,
    pending: np.ndarray,
    adj_row: np.ndarray,
    adj_pending: np.ndarray,
    cont_gex: np.ndarray,
    scalar_end: np.ndarray,
    total_gex: np.ndarray,
    gop: np.ndarray,
    shift: int,
) -> tuple[np.ndarray, np.ndarray]:
    """One unicode gap-scan step (unicode_gap.rs:108-138)."""
    shifted_row = _shift_right(row, adj_row, shift)
    shifted_pending = _shift_right(pending, adj_pending, shift)
    scalar_gex = _ssub(total_gex, cont_gex)
    pending_crossed_end = shifted_pending & scalar_end
    gap_penalty = _wadd(scalar_gex, gop & pending_crossed_end)
    candidate = _ssub(shifted_row, gap_penalty)
    row = np.maximum(row, candidate)
    candidate_pending = _ssub(shifted_pending, scalar_end)
    pending = np.maximum(pending, candidate_pending)
    return row, pending


def _propagate_unicode_gaps(
    row: np.ndarray,
    adj_row: np.ndarray,
    pending: np.ndarray,
    adj_pending: np.ndarray,
    cont_gex: np.ndarray,
    adj_cont_gex: np.ndarray,
    scalar_end: np.ndarray,
    adj_scalar_end: np.ndarray,
    gap_open: int,
    gap_extend: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Unicode log-shift scan (unicode_gap.rs:168-236 generalized)."""
    lanes = len(row)
    gop = np.full(lanes, gap_open, dtype=_U16)
    total_gex = np.full(lanes, gap_extend, dtype=_U16)
    cont_gex = cont_gex.copy()
    adj_cont_gex = adj_cont_gex.copy()
    scalar_end = scalar_end.copy()
    adj_scalar_end = adj_scalar_end.copy()
    zero = np.zeros(lanes, dtype=_U16)

    shift = 1
    while shift < lanes:
        row, pending = _unicode_gap_step(
            row, pending, adj_row, adj_pending, cont_gex, scalar_end, total_gex, gop, shift
        )
        if shift * 2 >= lanes:
            break
        # prepare_next_unicode_gap_step (unicode_gap.rs:140-166)
        shifted_cont = _shift_right(cont_gex, adj_cont_gex, shift)
        cont_gex = _wadd(cont_gex, shifted_cont)
        adj_cont_gex = _wadd(adj_cont_gex, _shift_right(adj_cont_gex, zero, shift))
        shifted_end = _shift_right(scalar_end, adj_scalar_end, shift)
        scalar_end = np.maximum(scalar_end, shifted_end)
        adj_scalar_end = np.maximum(
            adj_scalar_end, _shift_right(adj_scalar_end, zero, shift)
        )
        total_gex = _wadd(total_gex, total_gex)
        shift *= 2
    return row, pending


def _score_haystack_unicode(
    needle: bytes,
    haystack: bytes,
    scoring: Scoring,
    case_sensitive: bool,
    include_prefix: bool,
    lanes: int,
    keep_matrix: bool,
) -> SWResult:
    """Per-codepoint path (unicode.rs:10-217); one matrix row per needle
    codepoint, haystack stays per-byte with continuation-byte transport lanes."""
    needle_chars = case_needle_unicode(needle.decode("utf-8"), case_sensitive)
    rows = len(needle_chars)
    if rows == 0:
        return SWResult(0, None, None, lanes, 0, 0, False)

    n_chunks = -(-len(haystack) // lanes)
    haystack_chunks = n_chunks + 1
    matrix = np.zeros((rows + 1, haystack_chunks * lanes), dtype=_U16)
    masks = np.zeros((rows + 1, haystack_chunks * lanes), dtype=_U16)
    pending_masks = np.zeros((rows + 1, lanes), dtype=_U16)

    gap_extend = scoring.gap_extend_penalty
    gap_open = max(0, scoring.gap_open_penalty - scoring.gap_extend_penalty)
    match_plus_mismatch = (scoring.match_score + scoring.mismatch_penalty) & U16_MAX

    prefix_vec = np.zeros(lanes, dtype=_U16)
    if include_prefix:
        prefix_vec[0] = scoring.prefix_bonus
    prev_is_delim = np.zeros(lanes, dtype=bool)
    prev_is_lower = np.zeros(lanes, dtype=bool)
    prev_cont_gex = np.zeros(lanes, dtype=_U16)
    prev_scalar_start = np.zeros(lanes, dtype=_U16)
    max_scores = np.zeros(lanes, dtype=_U16)
    row_scores = np.zeros(lanes, dtype=_U16)

    for c in range(n_chunks):
        col = c + 1
        chunk_start = c * lanes
        byte_chunks = [_load_chunk(haystack, chunk_start, lanes, off) for off in (3, 2, 1, 0)]
        chunk = byte_chunks[3]

        valid = np.zeros(lanes, dtype=bool)
        valid[: max(0, min(lanes, len(haystack) - chunk_start))] = True
        continuation = (chunk > 0x7F) & (chunk < 0xC0) & valid
        scalar_start = ~continuation & valid
        scalar_start_u16 = np.where(scalar_start, np.uint16(U16_MAX), np.uint16(0))
        cont_gex = np.where(continuation, np.uint16(gap_extend), np.uint16(0))

        cap_mask, delim_mask, prev_is_lower, prev_is_delim = (
            _haystack_chunk_feature_masks(chunk, prev_is_lower, prev_is_delim)
        )
        bonuses = _wadd(
            _wadd(
                np.where(delim_mask, np.uint16(scoring.delimiter_bonus), np.uint16(0)),
                np.where(cap_mask, np.uint16(scoring.capitalization_bonus), np.uint16(0)),
            ),
            _wadd(prefix_vec, np.uint16(match_plus_mismatch)),
        )
        prefix_vec = np.zeros(lanes, dtype=_U16)

        up_gap_mask = np.zeros(lanes, dtype=_U16)
        prev_row = np.zeros(lanes, dtype=_U16)
        row_scores = np.zeros(lanes, dtype=_U16)
        lo = col * lanes
        left_lo = (col - 1) * lanes
        for i in range(1, rows + 1):
            nc = needle_chars[i - 1]
            exact_bool = _unicode_char_match_mask(byte_chunks, scalar_start, nc.chars)
            flip_bool = _unicode_char_match_mask(byte_chunks, scalar_start, nc.flipped_chars)
            match_bool = exact_bool | flip_bool
            match_mask = np.where(match_bool, np.uint16(U16_MAX), np.uint16(0))
            exact_u16 = np.where(exact_bool, np.uint16(U16_MAX), np.uint16(0))

            diag = _shift_right(prev_row, matrix[i - 1, left_lo : left_lo + lanes], 1)
            diag = _wadd(diag, match_mask & bonuses)
            diag = _ssub(diag, scoring.mismatch_penalty)
            diag = _wadd(diag, exact_u16 & np.uint16(scoring.matching_case_bonus))
            diag = diag & scalar_start_u16

            up = _ssub(prev_row, gap_extend)
            up = _ssub(up, up_gap_mask & np.uint16(gap_open))
            up = up & scalar_start_u16

            row_scores, pending = _propagate_unicode_gaps(
                np.maximum(diag, up),
                matrix[i, left_lo : left_lo + lanes],
                match_mask,
                pending_masks[i],
                cont_gex,
                prev_cont_gex,
                scalar_start_u16,
                prev_scalar_start,
                gap_open,
                gap_extend,
            )
            matrix[i, lo : lo + lanes] = row_scores
            masks[i, lo : lo + lanes] = match_mask
            pending_masks[i] = pending
            prev_row = row_scores
            up_gap_mask = match_mask

        max_scores = np.maximum(max_scores, row_scores)
        prev_cont_gex = cont_gex
        prev_scalar_start = scalar_start_u16

    score = int(max_scores.max())
    return SWResult(
        score=score,
        matrix=matrix if keep_matrix else None,
        masks=masks if keep_matrix else None,
        lanes=lanes,
        rows=rows,
        haystack_chunks=haystack_chunks,
        used_greedy=False,
    )


def _unicode_char_match_mask(
    byte_chunks: list[np.ndarray], scalar_start: np.ndarray, chars: bytes
) -> np.ndarray:
    """Whole-codepoint window match per lane (unicode.rs:220-241)."""
    char_len = len(chars)
    mask = (byte_chunks[4 - char_len] == chars[char_len - 1]) & scalar_start
    if char_len > 1 and mask.any():
        for byte_idx in range(char_len - 1):
            mask = mask & (byte_chunks[3 - byte_idx] == chars[byte_idx])
    return mask


def _traceback(
    result: SWResult,
    haystack_start_pos: int,
    unicode_haystack: bytes | None,
    max_typos: int | None,
) -> tuple[list[tuple[int, int]], bool]:
    """Walk the alignment path (alignment_iter.rs:108-181).

    Returns (matched (needle_idx, haystack_byte_idx) pairs in traceback
    order, ok) where ok=False means the typo budget was exceeded."""
    matrix, masks = result.matrix, result.masks
    assert matrix is not None and masks is not None
    lanes = result.lanes
    score = result.score
    rows = result.rows

    # get_col_idx: first lane equal to the max score in the final row
    # (alignment_iter.rs:71-85)
    col_idx = None
    final = matrix[rows]
    for chunk_idx in range(1, result.haystack_chunks):
        seg = final[chunk_idx * lanes : (chunk_idx + 1) * lanes]
        hits = np.nonzero(seg == score)[0]
        if len(hits):
            col_idx = chunk_idx * lanes + int(hits[0])
            break
    if col_idx is None:
        raise AssertionError("could not find max score in score matrix final row")

    row_idx = rows
    typo_count = 0
    cur_score = score
    out: list[tuple[int, int]] = []

    while row_idx > 0:
        if max_typos is not None and typo_count > max_typos:
            return out, False
        if col_idx < lanes or cur_score == 0:
            if max_typos is not None and (typo_count + row_idx) > max_typos:
                return out, False
            return out, True

        haystack_idx = col_idx - lanes
        current_pos = (row_idx - 1, haystack_idx + haystack_start_pos)

        if (
            unicode_haystack is not None
            and haystack_idx < len(unicode_haystack)
            and (unicode_haystack[haystack_idx] & 0xC0) == 0x80
        ):
            col_idx -= 1
            cur_score = int(matrix[row_idx, col_idx])
            continue

        if masks[row_idx, col_idx]:
            out.append(current_pos)
            row_idx -= 1
            col_idx -= 1
            cur_score = int(matrix[row_idx, col_idx])
            continue

        diag = int(matrix[row_idx - 1, col_idx - 1])
        left = int(matrix[row_idx, col_idx - 1])
        up = int(matrix[row_idx - 1, col_idx])
        if diag >= left and diag >= up:
            row_idx -= 1
            col_idx -= 1
            typo_count += 1
            cur_score = diag
        elif left >= up:
            col_idx -= 1
            cur_score = left
        else:
            typo_count += 1
            row_idx -= 1
            cur_score = up

    return out, True


def score_haystack_indices(
    needle: bytes | str,
    haystack: bytes | str,
    scoring: Scoring | None = None,
    case_sensitive: bool = False,
    haystack_start_pos: int = 0,
    max_typos: int | None = None,
    unicode: bool = False,
    lanes: int | None = None,
) -> tuple[int, list[int]]:
    """Score + matched haystack byte offsets in reverse order
    (smith_waterman/algo/mod.rs:49-153)."""
    scoring = scoring or Scoring()
    needle_b = needle.encode("utf-8") if isinstance(needle, str) else needle
    hay_b = haystack.encode("utf-8") if isinstance(haystack, str) else haystack

    if len(hay_b) > MAX_HAYSTACK_LEN:
        res = match_greedy(
            needle_b, hay_b, scoring, case_sensitive, haystack_start_pos == 0
        )
        if res is None:
            return 0, []
        score, fwd = res
        return score, [i + haystack_start_pos for i in reversed(fwd)]

    result = score_haystack(
        needle_b,
        hay_b,
        scoring,
        case_sensitive,
        include_prefix=haystack_start_pos == 0,
        unicode=unicode,
        lanes=lanes,
        keep_matrix=True,
    )
    if result.score == 0:
        return result.score, []

    if not unicode:
        path, _ok = _traceback(result, haystack_start_pos, None, max_typos)
        return result.score, [h for (_n, h) in path]

    needle_chars = case_needle_unicode(
        needle_b.decode("utf-8"), case_sensitive
    )
    path, _ok = _traceback(result, haystack_start_pos, hay_b, max_typos)
    indices: list[int] = []
    prev_h = None
    for needle_idx, haystack_idx in path:
        if prev_h != haystack_idx:
            length = needle_chars[needle_idx].length
            indices.extend(haystack_idx + off for off in range(length - 1, -1, -1))
            prev_h = haystack_idx
    return result.score, indices


def has_alignment_path(
    needle: bytes | str,
    haystack: bytes | str,
    max_typos: int,
    scoring: Scoring | None = None,
    case_sensitive: bool = False,
    unicode: bool = False,
    lanes: int | None = None,
) -> bool:
    """True when an alignment within the typo budget exists
    (alignment.rs:25-35). Test-surface equivalent of the reference's
    has_alignment_path."""
    scoring = scoring or Scoring()
    needle_b = needle.encode("utf-8") if isinstance(needle, str) else needle
    hay_b = haystack.encode("utf-8") if isinstance(haystack, str) else haystack
    result = score_haystack(
        needle_b,
        hay_b,
        scoring,
        case_sensitive,
        include_prefix=True,
        unicode=unicode,
        lanes=lanes,
        keep_matrix=True,
    )
    if result.used_greedy:
        return result.greedy_indices is not None
    _path, ok = _traceback(
        result, 0, hay_b if unicode else None, max_typos
    )
    return ok
