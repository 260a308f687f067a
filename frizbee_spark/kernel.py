"""Vectorized batch scoring kernel: numpy across the batch axis.

This is the engine that runs inside Arrow-batched pandas UDFs on Spark
executors — no per-row Python in the hot path (BASELINE.json input_hint).
Semantics are parity-tested against frizbee_spark.core.oracle, which is the
byte-for-byte transcription of the reference recurrence
(/root/reference/src/smith_waterman/algo/ascii.rs:10-158).

Shape strategy: haystacks are grouped into power-of-two length buckets so the
padded DP matrix (batch x padded_len) stays dense; the log-shift horizontal
gap scan runs on the full padded width (score-equivalent to the reference's
chunked scan — asserted lane-width-independent by the reference's backend
parity tests and re-verified in tests/test_kernel_parity.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .core.config import MAX_HAYSTACK_LEN, Config, Scoring, U16_MAX
from .core.matcher import Matcher
from .core.oracle import case_needle, match_greedy
from .core.pattern import Pattern

_U16 = np.uint16


def _ssub(a: np.ndarray, b) -> np.ndarray:
    """Saturating subtract via max(a,b)-b: a>=b -> a-b, else 0."""
    b_arr = np.asarray(b, dtype=a.dtype)
    out = np.maximum(a, b_arr)
    out -= b_arr
    return out


def _score_fits_in_u8(needle_len: int, scoring: Scoring) -> bool:
    """u8 dtype-narrowing eligibility, mirroring the reference's
    score_fits_in_u8 (/root/reference/src/smith_waterman/mod.rs:92-116):
    every possible matrix cell value must fit in u8. Halves the DP's memory
    traffic — numerically identical because the saturating arithmetic never
    reaches the wrap point when the max possible score fits. (The lane-width
    gap-penalty bound in the reference is replaced here by saturating
    penalty scalars in the log-shift scan: a penalty clipped at dtype-max
    still exceeds every cell value, so the decayed lane is 0 either way.)"""
    s = scoring
    max_constant = max(
        s.match_score + s.mismatch_penalty,
        s.gap_open_penalty,
        s.gap_extend_penalty,
        s.matching_case_bonus,
        s.capitalization_bonus,
        s.delimiter_bonus,
        s.prefix_bonus,
    )
    if max_constant > 0xFF:
        return False
    max_per_char = s.match_score + s.max_per_char_bonus()
    max_matrix_score = (
        max_per_char * needle_len + s.max_one_time_bonus() + s.prefix_bonus
    )
    return max_matrix_score + s.mismatch_penalty <= 0xFF


@dataclass
class BatchResult:
    """Columnar match results for one batch of haystacks."""

    matched: np.ndarray  # bool  (N,)
    score: np.ndarray  # uint16 (N,)
    exact: np.ndarray  # bool  (N,)
    #: haystack offset of the final matched position (src/lib.rs:150-152,
    #: the `match_end_col` feature surface): first max-scoring cell of the
    #: final DP row plus the window-trim start; 0 for unmatched rows
    end_col: np.ndarray | None = None  # uint16 (N,)


class AsciiKernel:
    """Compiled single-needle kernel for the ASCII fuzzy path.

    Vectorizes the reference's per-row pipeline (matcher/algo.rs:78-103):
    length filter -> ordered-containment prefilter -> window trim -> SW score
    -> exact bonus, across a batch of haystacks at once.
    """

    #: dtype of the haystack code matrix (uint8 bytes here; uint32
    #: codepoints in UnicodeKernel)
    code_dtype = np.uint8

    def __init__(self, needle: str, config: Config):
        self.config = config
        self.scoring = config.scoring
        self.needle = needle
        self.needle_bytes = needle.encode("utf-8")
        self.case_sensitive = config.casing.respects_case_for(needle)
        self._compile_needle()
        self.max_typos = config.max_typos
        self.min_len = (
            max(0, len(needle) - config.max_typos) if config.max_typos is not None else 0
        )
        scoring = config.scoring
        scoring.guard_against_score_overflow(
            len(self.needle_bytes),
            scoring.max_per_char_bonus(),
            scoring.max_one_time_bonus(),
        )
        # dtype narrowing (mod.rs:92-116): u8 DP when every cell fits,
        # halving memory traffic across the batch axis
        self.dtype = (
            np.uint8 if _score_fits_in_u8(self.rows, scoring) else np.uint16
        )

    def _compile_needle(self) -> None:
        """Per-code (orig, case-flipped) needle arrays; self.needle_codes is
        the exact-match reference for the exact bonus."""
        pairs = case_needle(self.needle_bytes, self.case_sensitive)
        self.n_orig = np.array([p[0] for p in pairs], dtype=self.code_dtype)
        self.n_flip = np.array([p[1] for p in pairs], dtype=self.code_dtype)
        self.needle_codes = np.frombuffer(self.needle_bytes, dtype=np.uint8)
        self.rows = len(pairs)

    @staticmethod
    def _encode_codes(b: bytes) -> np.ndarray:
        """Haystack bytes -> code array the DP matrix is built from."""
        return np.frombuffer(b, dtype=np.uint8)

    # ---- prefilter over a padded byte matrix ----

    def _prefilter_windows(
        self, hay: np.ndarray, lengths: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Vectorized membership + windows for one padded batch.

        hay: (N, C) uint8 zero-padded; lengths: (N,). Returns
        (matched bool, start int32, end int32). Semantics per
        frizbee_spark.core.prefilter (reference prefilter/algo/*)."""
        n_hay, width = hay.shape
        k = self.max_typos
        n = self.rows
        col = np.arange(width, dtype=np.int32)
        valid = col[None, :] < lengths[:, None]

        def eq(i: int) -> np.ndarray:
            return ((hay == self.n_orig[i]) | (hay == self.n_flip[i])) & valid

        if k is not None and k >= n:
            return (
                np.ones(n_hay, dtype=bool),
                np.zeros(n_hay, dtype=np.int32),
                lengths.astype(np.int32),
            )

        if k is None:
            return (
                np.ones(n_hay, dtype=bool),
                np.zeros(n_hay, dtype=np.int32),
                lengths.astype(np.int32),
            )

        def greedy_scan() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
            """Greedy forward subsequence scan; pos[i] = match position of
            needle byte i (prefilter/algo/ascii.rs:19-53). Returns
            (alive, first_pos, pos)."""
            pos = np.full(n_hay, -1, dtype=np.int32)
            alive = lengths > 0
            first_pos = np.full(n_hay, 0, dtype=np.int32)
            for i in range(n):
                cand = eq(i) & (col[None, :] > pos[:, None])
                has = cand.any(axis=1)
                nxt = np.argmax(cand, axis=1).astype(np.int32)
                alive = alive & has
                pos = np.where(alive, nxt, pos)
                if i == 0:
                    first_pos = np.where(alive, pos, 0)
            return alive, first_pos, pos

        if k == 0:
            matched, first_pos, _pos = greedy_scan()
            last_eq = eq(n - 1)
            end = (
                width - 1 - np.argmax(last_eq[:, ::-1], axis=1).astype(np.int32) + 1
            )
            end = np.where(matched, end, lengths.astype(np.int32))
            return matched, first_pos, end

        # k > 0: LCS membership (prefilter/mod.rs:1013-1047). A row passing
        # the (much cheaper) greedy 0-typo scan has LCS == n, so the O(n*m)
        # LCS runs only on rows that failed it.
        greedy_ok, _fp, _pos = greedy_scan()
        need = np.nonzero(~greedy_ok)[0]
        matched = greedy_ok.copy()
        if len(need):
            sub = hay[need]
            sub_valid = col[None, :] < lengths[need][:, None]
            dtype = np.int16 if n < 32000 else np.int32
            prev = np.zeros((len(need), width + 1), dtype=dtype)
            tmp = np.zeros((len(need), width + 1), dtype=dtype)
            for i in range(n):
                sub_eq = ((sub == self.n_orig[i]) | (sub == self.n_flip[i])) & sub_valid
                tmp[:, 0] = 0
                np.multiply(prev[:, :-1] + 1, sub_eq, out=tmp[:, 1:], casting="unsafe")
                np.maximum.accumulate(tmp, axis=1, out=tmp)
                np.maximum(prev, tmp, out=prev)
            lcs = prev[np.arange(len(need)), lengths[need].astype(np.intp)]
            matched[need] = (lcs + k) >= n

        head_eq = np.zeros((n_hay, width), dtype=bool)
        for i in range(min(k + 1, n)):
            head_eq |= eq(i)
        has_head = head_eq.any(axis=1)
        start = np.where(has_head, np.argmax(head_eq, axis=1), 0).astype(np.int32)

        tail_eq = np.zeros((n_hay, width), dtype=bool)
        for i in range(max(0, n - 1 - k), n):
            tail_eq |= eq(i)
        has_tail = tail_eq.any(axis=1)
        end = (
            width - 1 - np.argmax(tail_eq[:, ::-1], axis=1).astype(np.int32) + 1
        )
        end = np.where(has_tail, end, lengths.astype(np.int32))
        return matched, start, end

    # ---- Smith-Waterman over a padded byte matrix ----

    def _sw_scores(
        self, hay: np.ndarray, lengths: np.ndarray, include_prefix: np.ndarray
    ) -> np.ndarray:
        """Batched SW recurrence (ascii.rs:10-158) on (N, C) zero-padded
        bytes; C is a power of two. Runs in uint8 when the score range
        allows (self.dtype), else uint16; returns uint16 scores."""
        s = self.scoring
        n_hay, width = hay.shape
        if self.rows == 0 or n_hay == 0:
            return np.zeros(n_hay, dtype=_U16), np.zeros(n_hay, dtype=_U16)

        dt = self.dtype
        dt_max = int(np.iinfo(dt).max)
        gap_extend = dt(s.gap_extend_penalty)
        gap_open = dt(max(0, s.gap_open_penalty - s.gap_extend_penalty))
        match_plus_mismatch = dt((s.match_score + s.mismatch_penalty) & dt_max)

        # haystack-side lane bonuses (ascii.rs:64-101)
        is_upper = (hay >= 65) & (hay <= 90)
        is_lower = (hay >= 97) & (hay <= 122)
        is_digit = (hay >= 48) & (hay <= 57)
        is_delim = ~(is_upper | is_lower | is_digit | (hay > 127))
        prev_lower = np.zeros_like(is_lower)
        prev_lower[:, 1:] = is_lower[:, :-1]
        prev_delim = np.zeros_like(is_delim)
        prev_delim[:, 1:] = is_delim[:, :-1]
        cap_mask = is_upper & prev_lower
        delim_mask = prev_delim & ~is_delim

        bonuses = np.zeros((n_hay, width), dtype=dt)
        bonuses += np.where(delim_mask, dt(s.delimiter_bonus), dt(0))
        bonuses += np.where(cap_mask, dt(s.capitalization_bonus), dt(0))
        bonuses[:, 0] += np.where(include_prefix, dt(s.prefix_bonus), dt(0))
        with np.errstate(over="ignore"):
            bonuses += match_plus_mismatch

        prev_row = np.zeros((n_hay, width), dtype=dt)
        prev_mask = np.zeros((n_hay, width), dtype=bool)
        n_shifts = max(0, int(np.log2(width))) if width > 1 else 0

        for i in range(self.rows):
            exact_mask = hay == self.n_orig[i]
            match_mask = exact_mask | (hay == self.n_flip[i])

            diag = np.zeros((n_hay, width), dtype=dt)
            diag[:, 1:] = prev_row[:, :-1]
            with np.errstate(over="ignore"):
                diag += np.where(match_mask, bonuses, dt(0))
            diag = _ssub(diag, dt(s.mismatch_penalty))
            with np.errstate(over="ignore"):
                diag += np.where(exact_mask, dt(s.matching_case_bonus), dt(0))

            up = _ssub(prev_row, gap_extend)
            up = _ssub(up, np.where(prev_mask, gap_open, dt(0)))

            row = self._hgap_pass(
                np.maximum(diag, up), match_mask, n_shifts, gap_extend, gap_open
            )

            prev_row = row
            prev_mask = match_mask

        # end_col: FIRST max-scoring cell of the final row (algo/mod.rs:
        # 165-197 iterates chunks with a strictly-greater update, i.e. the
        # earliest occurrence — np.argmax matches that exactly)
        return (
            prev_row.max(axis=1).astype(_U16),
            np.argmax(prev_row, axis=1).astype(_U16),
        )

    def _include_prefix(
        self, start: np.ndarray, t_start: np.ndarray, first_codes: np.ndarray
    ) -> np.ndarray:
        """Prefix-bonus eligibility: the trimmed window starts at offset 0
        of the haystack (matcher/algo.rs:331-338, byte units)."""
        return t_start == 0

    def _hgap_pass(
        self,
        row: np.ndarray,
        match_mask: np.ndarray,
        n_shifts: int,
        gap_extend,
        gap_open,
    ) -> np.ndarray:
        """Horizontal gap scan: log-shift with doubling extend penalties
        (ascii_gap.rs:11-43), full width. The doubling extend penalty
        SATURATES at dtype-max: a clipped penalty still exceeds every
        reachable cell value (overflow guard / u8 eligibility), so the
        decayed lane is 0 either way — wrapping would instead
        under-penalize long shifts."""
        dt = self.dtype
        dt_max = int(np.iinfo(dt).max)
        n_hay, width = row.shape
        gex_int = int(gap_extend)
        gop_int = int(gap_open)
        shift = 1
        for _ in range(n_shifts):
            shifted = np.zeros_like(row)
            shifted[:, shift:] = row[:, :-shift]
            shifted_mm = np.zeros((n_hay, width), dtype=bool)
            shifted_mm[:, shift:] = match_mask[:, :-shift]
            pen_match = dt(min(gex_int + gop_int, dt_max))
            pen_nomatch = dt(min(gex_int, dt_max))
            penalty = np.where(shifted_mm, pen_match, pen_nomatch)
            row = np.maximum(row, _ssub(shifted, penalty))
            gex_int = min(gex_int * 2, dt_max)
            shift *= 2
        return row

    # ---- full row pipeline ----

    def _match_big_row(self, encoded_row: bytes, with_end_col: bool = False):
        """Row pipeline for haystacks > MAX_HAYSTACK_LEN (rare)."""
        return _greedy_row(
            self.needle_bytes,
            encoded_row,
            self.scoring,
            self.case_sensitive,
            self.max_typos,
            with_end_col=with_end_col,
        )

    def match_batch(self, texts, with_end_col: bool = False) -> BatchResult:
        """Run the full match_list row pipeline over a batch of strings."""
        encoded = [t.encode("utf-8") for t in texts]
        n_total = len(encoded)
        matched = np.zeros(n_total, dtype=bool)
        scores = np.zeros(n_total, dtype=_U16)
        exact = np.zeros(n_total, dtype=bool)
        end_cols = np.zeros(n_total, dtype=_U16)
        if self.rows == 0:
            # empty needle: everything matches with score 0 (matcher/mod.rs Empty)
            return BatchResult(np.ones(n_total, dtype=bool), scores, exact, end_cols)

        byte_lengths = np.array([len(b) for b in encoded], dtype=np.int32)
        eligible = np.nonzero(byte_lengths >= self.min_len)[0]
        if len(eligible) == 0:
            return BatchResult(matched, scores, exact, end_cols)

        # oversized haystacks take the greedy path row-by-row (rare)
        big = eligible[byte_lengths[eligible] > MAX_HAYSTACK_LEN]
        small = eligible[byte_lengths[eligible] <= MAX_HAYSTACK_LEN]

        for idx in big:
            m = self._match_big_row(encoded[idx], with_end_col)
            if m is not None:
                matched[idx], scores[idx], exact[idx] = True, m[0], m[1]
                end_cols[idx] = m[2]

        if len(small) == 0:
            return BatchResult(matched, scores, exact, end_cols)

        # code arrays (identity view for ascii; codepoints for unicode) —
        # matrix packing, prefilter windows and trims are all in code units
        codes: dict[int, np.ndarray] = {
            int(i): self._encode_codes(encoded[i]) for i in small
        }
        lengths = byte_lengths.copy()
        for i, c in codes.items():
            lengths[i] = len(c)

        # length-bucketed processing keeps the padded matrices dense
        order = small[np.argsort(lengths[small], kind="stable")]
        for lo_pow in _bucket_bounds(lengths[order]):
            bucket = order[lo_pow]
            self._match_bucket(bucket, codes, lengths, matched, scores, exact, end_cols)
        return BatchResult(matched, scores, exact, end_cols)

    def _match_bucket(
        self, idxs, codes, lengths, matched, scores, exact, end_cols
    ) -> None:
        max_len = int(lengths[idxs].max()) if len(idxs) else 0
        width = 1
        while width < max(1, max_len):
            width *= 2
        hay = np.zeros((len(idxs), width), dtype=self.code_dtype)
        for r, idx in enumerate(idxs):
            c = codes[int(idx)]
            hay[r, : len(c)] = c
        blens = lengths[idxs]

        ok, start, end = self._prefilter_windows(hay, blens)
        if not ok.any():
            return
        survivors = np.nonzero(ok)[0]

        # window trim (matcher/algo.rs:331-338): re-pack trimmed slices
        t_start = np.maximum(start[survivors] - 1, 0)
        t_end = end[survivors]
        t_lens = (t_end - t_start).astype(np.int32)
        include_exact = (t_start == 0) & (t_end == blens[survivors])
        t_width = 1
        while t_width < max(1, int(t_lens.max())):
            t_width *= 2
        trimmed = np.zeros((len(survivors), t_width), dtype=self.code_dtype)
        for r, si in enumerate(survivors):
            trimmed[r, : t_lens[r]] = hay[si, t_start[r] : t_end[r]]

        include_prefix = self._include_prefix(
            start[survivors], t_start, hay[survivors, 0]
        )
        sw, sw_end = self._sw_scores(trimmed, t_lens, include_prefix=include_prefix)
        # end_col in ORIGINAL haystack offsets: trimmed-window argmax plus
        # the trim start (matcher/algo.rs:257-261 saturating_add)
        end_global = np.minimum(
            sw_end.astype(np.int64) + t_start.astype(np.int64), U16_MAX
        ).astype(_U16)

        # exact bonus (matcher/algo.rs:244-248)
        nb = self.needle_codes
        is_exact = include_exact & (t_lens == len(nb))
        if is_exact.any() and len(nb) <= t_width:
            eq_needle = (trimmed[:, : len(nb)] == nb[None, :]).all(axis=1)
            is_exact = is_exact & eq_needle
            sw = np.where(
                is_exact,
                np.minimum(
                    sw.astype(np.int64) + self.scoring.exact_match_bonus, U16_MAX
                ).astype(_U16),
                sw,
            )

        out_idx = idxs[survivors]
        matched[out_idx] = True
        scores[out_idx] = sw
        exact[out_idx] = is_exact
        end_cols[out_idx] = end_global


def _wadd16(a: np.ndarray, b) -> np.ndarray:
    """Wrapping uint16 add."""
    with np.errstate(over="ignore"):
        return a + np.asarray(b, dtype=_U16)


def _shr2d(mat: np.ndarray, shift: int) -> np.ndarray:
    """Shift each row right by `shift` lanes, zero-filled (the adj vector
    of the reference's cross-chunk transport is all-zero at full width)."""
    out = np.zeros_like(mat)
    out[:, shift:] = mat[:, :-shift]
    return out


def _encode_utf8_batch(
    hay: np.ndarray, lengths: np.ndarray, trim_first: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized codepoint-matrix -> utf-8 byte-matrix encoding.

    `hay` is an (n, width) uint32 codepoint matrix with per-row `lengths`;
    rows flagged in `trim_first` emit only the FINAL utf-8 byte of their
    first codepoint (the left-trim context-char reduction of
    matcher/algo.rs:331-338). Returns (byte_matrix zero-padded to a
    power-of-two width, byte_lengths). Pure numpy — scalar work per
    codepoint CLASS (1-4 byte sequences), not per row."""
    n_hay, width = hay.shape
    col_valid = np.arange(width, dtype=np.int32)[None, :] < lengths[:, None]
    cps = np.where(col_valid, hay, 0)
    # utf-8 sequence length per codepoint (RFC 3629 ranges)
    blen = np.ones((n_hay, width), dtype=np.int32)
    blen += cps >= 0x80
    blen += cps >= 0x800
    blen += cps >= 0x10000
    blen[~col_valid] = 0
    eff = blen.copy()
    if trim_first.any():
        eff[trim_first, 0] = 1
    # per-codepoint start offsets within the row (exclusive cumsum)
    ends = np.cumsum(eff, axis=1)
    starts = ends - eff
    byte_lens = ends[:, -1].astype(np.int32) if width else np.zeros(n_hay, np.int32)
    bw = 1
    while bw < max(1, int(byte_lens.max(initial=1))):
        bw *= 2
    flat = np.zeros(n_hay * bw, dtype=np.uint8)
    row_base = (np.arange(n_hay, dtype=np.int64) * bw)[:, None]
    pos = row_base + starts
    first_trimmed = np.zeros((n_hay, width), dtype=bool)
    first_trimmed[:, 0] = trim_first
    full = col_valid & ~first_trimmed
    # trimmed first codepoints: final byte only (continuation 0x80|(cp&0x3F);
    # a trimmed first cp is always multi-byte since trim requires cp >= 128)
    t = first_trimmed & col_valid
    if t.any():
        flat[pos[t]] = (0x80 | (cps[t] & 0x3F)).astype(np.uint8)
    m1 = full & (blen == 1)
    flat[pos[m1]] = cps[m1].astype(np.uint8)
    m2 = full & (blen == 2)
    if m2.any():
        flat[pos[m2]] = (0xC0 | (cps[m2] >> 6)).astype(np.uint8)
        flat[pos[m2] + 1] = (0x80 | (cps[m2] & 0x3F)).astype(np.uint8)
    m3 = full & (blen == 3)
    if m3.any():
        flat[pos[m3]] = (0xE0 | (cps[m3] >> 12)).astype(np.uint8)
        flat[pos[m3] + 1] = (0x80 | ((cps[m3] >> 6) & 0x3F)).astype(np.uint8)
        flat[pos[m3] + 2] = (0x80 | (cps[m3] & 0x3F)).astype(np.uint8)
    m4 = full & (blen == 4)
    if m4.any():
        flat[pos[m4]] = (0xF0 | (cps[m4] >> 18)).astype(np.uint8)
        flat[pos[m4] + 1] = (0x80 | ((cps[m4] >> 12) & 0x3F)).astype(np.uint8)
        flat[pos[m4] + 2] = (0x80 | ((cps[m4] >> 6) & 0x3F)).astype(np.uint8)
        flat[pos[m4] + 3] = (0x80 | (cps[m4] & 0x3F)).astype(np.uint8)
    return flat.reshape(n_hay, bw), byte_lens


class UnicodeKernel(AsciiKernel):
    """Batched unicode kernel: the byte-lane recurrence of the reference's
    unicode backend (unicode.rs:10-217, unicode_gap.rs:108-236) with a
    batch axis added.

    The haystack stays per BYTE; continuation bytes act as free "transport"
    lanes so that codepoint-level semantics emerge: matches compare whole
    utf-8 codepoint windows at lead lanes, horizontal gaps charge
    gap_extend once per codepoint crossed (scalar_gex = total - cont), and
    the decaying `pending` flag charges gap_open when a match-sourced span
    first crosses a codepoint boundary. The prefilter and window trim run
    on CODEPOINT matrices (prefilter_unicode semantics); _sw_scores
    re-encodes the trimmed codepoint windows to bytes, reducing a trimmed
    leading context char to its final byte exactly as the byte-level trim
    does (matcher/algo.rs:331-338). Parity vs the scalar oracle matcher is
    fuzz-tested in tests/test_kernel_parity.py. Oversized rows fall back
    to the scalar matcher row pipeline (rare, bounded by MAX_HAYSTACK_LEN)."""

    code_dtype = np.uint32

    def _compile_needle(self) -> None:
        from .core.oracle import case_needle_unicode

        self.uchars = case_needle_unicode(self.needle, self.case_sensitive)
        self.n_orig = np.array(
            [ord(c.chars.decode("utf-8")) for c in self.uchars], dtype=np.uint32
        )
        self.n_flip = np.array(
            [ord(c.flipped_chars.decode("utf-8")) for c in self.uchars],
            dtype=np.uint32,
        )
        self.needle_codes = np.array([ord(ch) for ch in self.needle], dtype=np.uint32)
        self.rows = len(self.uchars)

    @staticmethod
    def _encode_codes(b: bytes) -> np.ndarray:
        s = b.decode("utf-8", errors="replace")
        return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)

    def _match_big_row(self, encoded_row: bytes):
        from .core.matcher import Matcher

        matcher = Matcher([Pattern.new(self.needle)], self.config)
        m = matcher.match_one(encoded_row.decode("utf-8", errors="replace"), 0)
        return None if m is None else (m.score, m.exact)

    def _include_prefix(
        self, start: np.ndarray, t_start: np.ndarray, first_codes: np.ndarray
    ) -> np.ndarray:
        """Byte-unit prefix eligibility: trimmed byte window starts at 0 —
        start codepoint 0, or codepoint 1 preceded by a single-byte char."""
        return (start == 0) | ((start == 1) & (first_codes < 128))

    def _sw_scores(
        self, hay: np.ndarray, lengths: np.ndarray, include_prefix: np.ndarray
    ) -> np.ndarray:
        """Batched byte-lane unicode SW. `hay` is the trimmed CODEPOINT
        matrix from _match_bucket; rows are re-encoded to utf-8 (context
        char -> final byte only when the window was left-trimmed) by one
        vectorized expansion across the whole batch — the round-3 layout
        round-tripped every row through "".join(chr(...)).encode(), a
        per-row Python loop inside the batch kernel (VERDICT r3)."""
        n_hay = hay.shape[0]
        if self.rows == 0 or n_hay == 0:
            return np.zeros(n_hay, dtype=_U16), np.zeros(n_hay, dtype=_U16)

        trim = (~include_prefix) & (lengths > 0) & (hay[:, 0] >= 128)
        bh, byte_lens = _encode_utf8_batch(hay, lengths, trim)
        return self._sw_scores_bytes(bh, byte_lens, include_prefix)

    def _sw_scores_bytes(
        self, hay: np.ndarray, lengths: np.ndarray, include_prefix: np.ndarray
    ) -> np.ndarray:
        """Transcription of oracle._score_haystack_unicode with a batch
        axis; full-width lanes (adj transport vectors are zero)."""
        s = self.scoring
        n_hay, width = hay.shape
        col = np.arange(width, dtype=np.int32)
        valid = col[None, :] < lengths[:, None]

        gap_extend = np.uint16(s.gap_extend_penalty)
        gap_open = np.uint16(max(0, s.gap_open_penalty - s.gap_extend_penalty))
        mpm = np.uint16((s.match_score + s.mismatch_penalty) & U16_MAX)
        FULL = np.uint16(U16_MAX)

        continuation = (hay > 0x7F) & (hay < 0xC0) & valid
        scalar_start = ~continuation & valid
        ss_u16 = np.where(scalar_start, FULL, np.uint16(0))
        cont_gex = np.where(continuation, gap_extend, np.uint16(0))

        # byte-class bonus masks (ascii.rs:64-95 semantics)
        is_upper = (hay >= 65) & (hay <= 90)
        is_lower = (hay >= 97) & (hay <= 122)
        is_digit = (hay >= 48) & (hay <= 57)
        is_delim = ~(is_upper | is_lower | is_digit | (hay > 127))
        prev_lower = np.zeros_like(is_lower)
        prev_lower[:, 1:] = is_lower[:, :-1]
        prev_delim = np.zeros_like(is_delim)
        prev_delim[:, 1:] = is_delim[:, :-1]
        cap_mask = is_upper & prev_lower
        delim_mask = prev_delim & ~is_delim

        bonuses = np.where(delim_mask, np.uint16(s.delimiter_bonus), np.uint16(0))
        bonuses = _wadd16(
            bonuses, np.where(cap_mask, np.uint16(s.capitalization_bonus), np.uint16(0))
        )
        bonuses[:, 0] = _wadd16(
            bonuses[:, 0],
            np.where(include_prefix, np.uint16(s.prefix_bonus), np.uint16(0)),
        )
        bonuses = _wadd16(bonuses, mpm)

        # whole-codepoint window match masks at lead lanes (unicode.rs:220-241)
        shifted_hay = [hay]
        for off in (1, 2, 3):
            sh = np.zeros_like(hay)
            sh[:, :-off] = hay[:, off:]
            shifted_hay.append(sh)

        def win_match(chars: bytes) -> np.ndarray:
            m = scalar_start.copy()
            for j, b in enumerate(chars):
                m &= shifted_hay[j] == b
            return m

        prev_row = np.zeros((n_hay, width), dtype=_U16)
        up_gap_mask = np.zeros((n_hay, width), dtype=_U16)
        row = prev_row
        for i in range(self.rows):
            nc = self.uchars[i]
            exact_bool = win_match(nc.chars)
            if nc.flipped_chars != nc.chars:
                match_bool = exact_bool | win_match(nc.flipped_chars)
            else:
                match_bool = exact_bool
            match_mask = np.where(match_bool, FULL, np.uint16(0))
            exact_u16 = np.where(exact_bool, FULL, np.uint16(0))

            diag = np.zeros((n_hay, width), dtype=_U16)
            diag[:, 1:] = prev_row[:, :-1]
            diag = _wadd16(diag, match_mask & bonuses)
            diag = _ssub(diag, np.uint16(s.mismatch_penalty))
            diag = _wadd16(diag, exact_u16 & np.uint16(s.matching_case_bonus))
            diag &= ss_u16

            up = _ssub(prev_row, gap_extend)
            up = _ssub(up, up_gap_mask & gap_open)
            up &= ss_u16

            row = self._propagate_unicode_gaps(
                np.maximum(diag, up),
                match_mask,
                cont_gex,
                ss_u16,
                gap_open,
                gap_extend,
            )
            prev_row = row
            up_gap_mask = match_mask

        return row.max(axis=1).astype(_U16), np.argmax(row, axis=1).astype(_U16)

    @staticmethod
    def _propagate_unicode_gaps(
        row: np.ndarray,
        pending: np.ndarray,
        cont_gex_in: np.ndarray,
        scalar_end_in: np.ndarray,
        gap_open: np.uint16,
        gap_extend: np.uint16,
    ) -> np.ndarray:
        """Batched oracle._propagate_unicode_gaps (unicode_gap.rs:168-236)
        at full width with zero adj vectors."""
        n_hay, width = row.shape
        total_gex = np.full((n_hay, width), gap_extend, dtype=_U16)
        cont_gex = cont_gex_in.copy()
        scalar_end = scalar_end_in.copy()
        gop = np.uint16(gap_open)
        shift = 1
        while shift < width:
            shifted_row = _shr2d(row, shift)
            shifted_pending = _shr2d(pending, shift)
            scalar_gex = _ssub(total_gex, cont_gex)
            crossed = shifted_pending & scalar_end
            gap_penalty = _wadd16(scalar_gex, crossed & gop)
            row = np.maximum(row, _ssub(shifted_row, gap_penalty))
            pending = np.maximum(pending, _ssub(shifted_pending, scalar_end))
            if shift * 2 >= width:
                break
            cont_gex = _wadd16(cont_gex, _shr2d(cont_gex, shift))
            scalar_end = np.maximum(scalar_end, _shr2d(scalar_end, shift))
            total_gex = _wadd16(total_gex, total_gex)
            shift *= 2
        return row


def _greedy_row(
    needle: bytes,
    haystack: bytes,
    scoring: Scoring,
    case_sensitive: bool,
    max_typos: int | None,
    with_end_col: bool = False,
) -> tuple[int, bool, int] | None:
    """Row pipeline for haystacks > MAX_HAYSTACK_LEN: prefilter then greedy
    score; never exact (window covers all, but huge haystack != needle).
    Returns (score, exact, end_col) — end_col mirrors the reference's
    oversized path (smith_waterman/algo/mod.rs:166-178): a SECOND greedy
    pass over the FULL haystack whose last matched index is end_col, 0
    when it finds nothing. The reference only compiles that pass under the
    `match_end_col` feature, so it is gated here behind `with_end_col`
    the same way — callers that never read end_col (e.g. verify's SW
    rescue) must not pay a doubled oversized-row cost (ADVICE r3)."""
    from .core.prefilter import prefilter_ascii, trim_haystack

    if max_typos is not None:
        m, start, end = prefilter_ascii(needle, haystack, max_typos, case_sensitive)
        if not m:
            return None
    else:
        start, end = 0, len(haystack)
    trimmed, start_pos, include_exact = trim_haystack(haystack, start, end)
    if len(trimmed) > MAX_HAYSTACK_LEN:
        res = match_greedy(needle, trimmed, scoring, case_sensitive, start_pos == 0)
        score = res[0] if res else 0
    else:
        from .core.oracle import score_haystack

        score = score_haystack(
            needle,
            trimmed,
            scoring,
            case_sensitive,
            include_prefix=start_pos == 0,
        ).score
    is_exact = include_exact and needle == trimmed
    if is_exact:
        score = min(U16_MAX, score + scoring.exact_match_bonus)
    end_col = 0
    if with_end_col:
        full = match_greedy(needle, haystack, scoring, case_sensitive, True)
        end_col = min(full[1][-1], U16_MAX) if full and full[1] else 0
    return score, is_exact, end_col


def _bucket_bounds(sorted_lengths: np.ndarray):
    """Split index ranges of an ascending length array at power-of-two
    boundaries; yields slices into the sorted order."""
    if len(sorted_lengths) == 0:
        return
    boundaries = [0]
    cur_pow = 1
    while cur_pow < max(1, int(sorted_lengths[-1])):
        cur_pow *= 2
        cut = int(np.searchsorted(sorted_lengths, cur_pow, side="right"))
        if cut > boundaries[-1]:
            boundaries.append(cut)
    if boundaries[-1] != len(sorted_lengths):
        boundaries.append(len(sorted_lengths))
    for lo, hi in zip(boundaries[:-1], boundaries[1:]):
        yield slice(lo, hi)


class LiteralKernel:
    """Vectorized literal matching modes (exact / prefix / suffix /
    substring) for ASCII needles — the batch mirror of
    core.literal.LiteralMatcher (/root/reference/src/literal/algo.rs:229-313,
    whose literal backend is the reference's FAST path). Candidate
    positions, case-bonus counts, and positional bonuses (prefix /
    capitalization / delimiter) are all computed as whole-matrix numpy
    passes; the per-window bonus sum comes from a cumulative-sum gather, so
    cost is O(batch x width x needle_len) with no per-row Python."""

    def __init__(self, needle: str, config: Config):
        from .core.literal import LiteralMatcher
        from .core.oracle import case_needle_unicode

        needle_bytes = needle.encode("utf-8")
        LiteralMatcher._guard(len(needle_bytes), config.scoring)
        self.mode = config.matching
        self.scoring = config.scoring
        case_sensitive = config.casing.respects_case_for(needle)
        self.unicode = config.unicode.respects_unicode_for(needle)
        if self.unicode:
            # per-CODEPOINT pieces (literal/algo.rs:157-178 unicode arm +
            # the fold guards of prefilter/mod.rs:71-96): a haystack piece
            # must equal the char's utf-8 run or its flipped run WHOLLY —
            # per-byte orig/flip mixing must reject (the reference's
            # Cherokee hybrid-bytes fixture). flipped_chars is guaranteed
            # byte-length-equal to chars (length-changing folds ignored),
            # so orig/flip buffers align byte-for-byte.
            uchars = case_needle_unicode(needle, case_sensitive)
            self.orig = np.frombuffer(
                b"".join(c.chars for c in uchars), dtype=np.uint8
            )
            self.flip = np.frombuffer(
                b"".join(c.flipped_chars for c in uchars), dtype=np.uint8
            )
            lens = np.array([c.length for c in uchars], dtype=np.int64)
            self.char_starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=self.char_starts[1:])
            self.n = int(lens.sum())
            self.n_chars = len(uchars)
        else:
            pairs = case_needle(needle_bytes, case_sensitive)
            self.orig = np.array([p[0] for p in pairs], dtype=np.uint8)
            self.flip = np.array([p[1] for p in pairs], dtype=np.uint8)
            self.n = len(pairs)
            self.n_chars = self.n
            self.char_starts = np.arange(self.n, dtype=np.int64)

    def match_batch(self, texts) -> BatchResult:
        encoded = [t.encode("utf-8") for t in texts]
        n_total = len(encoded)
        matched = np.zeros(n_total, dtype=bool)
        scores = np.zeros(n_total, dtype=_U16)
        exact = np.zeros(n_total, dtype=bool)
        end_cols = np.zeros(n_total, dtype=_U16)
        lengths = np.array([len(b) for b in encoded], dtype=np.int64)
        eligible = np.nonzero(lengths >= max(1, self.n))[0]
        if self.n == 0 or len(eligible) == 0:
            return BatchResult(matched, scores, exact, end_cols)
        order = eligible[np.argsort(lengths[eligible], kind="stable")]
        for sl in _bucket_bounds(lengths[order]):
            self._bucket(order[sl], encoded, lengths, matched, scores, exact, end_cols)
        return BatchResult(matched, scores, exact, end_cols)

    def _bucket(self, idxs, encoded, lengths, matched, scores, exact, end_cols) -> None:
        from .core.config import Matching

        s = self.scoring
        n = self.n
        blens = lengths[idxs].astype(np.int64)
        width = 1
        while width < max(1, int(blens.max())):
            width *= 2
        width = max(width, n)
        n_hay = len(idxs)
        hay = np.zeros((n_hay, width), dtype=np.uint8)
        for r, idx in enumerate(idxs):
            b = encoded[int(idx)]
            hay[r, : len(b)] = np.frombuffer(b, dtype=np.uint8)

        # positional bonuses over the whole matrix (literal/algo.rs:180-202):
        # bonus[i] = prefix at 0; else capitalization (upper after lower) +
        # delimiter (non-delim after delim). Padding bytes never enter a
        # window (positions are clamped to len - n) so their values are inert.
        upper = (hay >= 65) & (hay <= 90)
        lower = (hay >= 97) & (hay <= 122)
        digit = (hay >= 48) & (hay <= 57)
        delim = ~(upper | lower | digit) & (hay <= 127)
        bonus = np.zeros((n_hay, width), dtype=np.int32)
        bonus[:, 0] = s.prefix_bonus
        if width > 1:
            bonus[:, 1:] = s.capitalization_bonus * (
                upper[:, 1:] & lower[:, :-1]
            ) + s.delimiter_bonus * (delim[:, :-1] & ~delim[:, 1:])
        cum = np.zeros((n_hay, width + 1), dtype=np.int32)
        np.cumsum(bonus, axis=1, out=cum[:, 1:])

        if self.mode is Matching.SUBSTRING:
            n_pos = width - n + 1
            ok = np.ones((n_hay, n_pos), dtype=bool)
            casecnt = np.zeros((n_hay, n_pos), dtype=np.int32)
            if self.unicode:
                # per-codepoint piece equality + per-CHAR-START bonuses
                # (literal/algo.rs:204-227: match_score and positional
                # bonuses accrue once per character, not per byte)
                bonus_sum = np.zeros((n_hay, n_pos), dtype=np.int32)
                for ci in range(self.n_chars):
                    st = int(self.char_starts[ci])
                    ln = (
                        int(self.char_starts[ci + 1]) - st
                        if ci + 1 < self.n_chars
                        else n - st
                    )
                    eq_o = np.ones((n_hay, n_pos), dtype=bool)
                    eq_f = np.ones((n_hay, n_pos), dtype=bool)
                    for j in range(st, st + ln):
                        seg = hay[:, j : j + n_pos]
                        eq_o &= seg == self.orig[j]
                        eq_f &= seg == self.flip[j]
                    ok &= eq_o | eq_f
                    casecnt += eq_o
                    bonus_sum += bonus[:, st : st + n_pos]
            else:
                for k in range(n):
                    seg = hay[:, k : k + n_pos]
                    eq = seg == self.orig[k]
                    ok &= eq | (seg == self.flip[k])
                    casecnt += eq
                bonus_sum = cum[:, n : n + n_pos] - cum[:, :n_pos]
            ok &= np.arange(n_pos, dtype=np.int64)[None, :] <= (blens - n)[:, None]
            sc = (
                self.n_chars * s.match_score
                + s.matching_case_bonus * casecnt
                + bonus_sum
            )
            sc[:, 0] += np.where(blens == n, s.exact_match_bonus, 0)
            np.minimum(sc, U16_MAX, out=sc)
            sc = np.where(ok, sc, -1)
            # earliest position among maxima (argmax returns the first),
            # matching LiteralMatcher.find's strict-improvement scan
            best_pos = np.argmax(sc, axis=1)
            best = sc[np.arange(n_hay), best_pos]
            has = best >= 0
            out_idx = idxs[has]
            matched[out_idx] = True
            scores[out_idx] = best[has].astype(_U16)
            exact[out_idx] = (best_pos[has] == 0) & (blens[has] == n)
            # literal end_col = last matched byte (literal/algo.rs:112-114)
            end_cols[out_idx] = np.minimum(best_pos[has] + n - 1, U16_MAX).astype(_U16)
            return

        if self.mode is Matching.SUFFIX:
            pos = blens - n
        else:  # EXACT / PREFIX anchor at 0
            pos = np.zeros(n_hay, dtype=np.int64)
        gather = pos[:, None] + np.arange(n, dtype=np.int64)[None, :]
        seg = hay[np.arange(n_hay)[:, None], gather]
        # per-codepoint piece equality: reduceat over each char's byte run
        # (identity for ASCII, where char_starts is arange(n))
        eq_o = np.logical_and.reduceat(seg == self.orig[None, :], self.char_starts, axis=1)
        eq_f = np.logical_and.reduceat(seg == self.flip[None, :], self.char_starts, axis=1)
        ok = (eq_o | eq_f).all(axis=1)
        if self.mode is Matching.EXACT:
            ok &= blens == n
        casecnt = eq_o.sum(axis=1, dtype=np.int32)
        rows = np.arange(n_hay)
        # positional bonuses at CHAR starts only (per-byte for ASCII)
        bonus_sum = bonus[rows[:, None], pos[:, None] + self.char_starts[None, :]].sum(
            axis=1, dtype=np.int32
        )
        sc = (
            self.n_chars * s.match_score
            + s.matching_case_bonus * casecnt
            + bonus_sum
        )
        is_exact = (pos == 0) & (blens == n)
        sc = sc + np.where(is_exact, s.exact_match_bonus, 0)
        np.minimum(sc, U16_MAX, out=sc)
        out_idx = idxs[ok]
        matched[out_idx] = True
        scores[out_idx] = sc[ok].astype(_U16)
        exact[out_idx] = is_exact[ok]
        end_cols[out_idx] = np.minimum(pos[ok] + n - 1, U16_MAX).astype(_U16)


def match_batch(
    needle: str, texts, config: Config | None = None, with_end_col: bool = False
) -> BatchResult:
    """Score a batch of haystacks against one needle.

    Fuzzy matching is fully vectorized: ASCII needles on the uint8 byte
    kernel, unicode needles on the uint32 codepoint kernel. Literal
    matching modes (exact/prefix/suffix/substring) run on the vectorized
    LiteralKernel for both ASCII and unicode needles (per-codepoint piece
    comparison in the unicode case); only the empty-needle literal falls
    through to the scalar matcher.

    `with_end_col` enables the oversized-haystack (> MAX_HAYSTACK_LEN)
    end_col computation, which costs a second full-haystack greedy pass —
    mirroring the reference's opt-in `match_end_col` feature. Matrix and
    literal paths report end_col either way (free there)."""
    config = config or Config()
    if config.matching.is_fuzzy:
        if config.unicode.respects_unicode_for(needle):
            return UnicodeKernel(needle, config).match_batch(texts, with_end_col)
        return AsciiKernel(needle, config).match_batch(texts, with_end_col)

    if needle:
        return LiteralKernel(needle, config).match_batch(texts)

    matcher = Matcher([Pattern.new(needle)] if needle else [], config)
    n = len(texts)
    matched = np.zeros(n, dtype=bool)
    scores = np.zeros(n, dtype=_U16)
    exact = np.zeros(n, dtype=bool)
    end_cols = np.zeros(n, dtype=_U16)
    for i, t in enumerate(texts):
        m = matcher.match_one_indices(t, i)
        if m is not None:
            matched[i], scores[i], exact[i] = True, m.score, m.exact
            if m.indices:
                # literal indices are emitted last-first; end_col = last byte
                end_cols[i] = min(m.indices[0], U16_MAX)
    return BatchResult(matched, scores, exact, end_cols)
