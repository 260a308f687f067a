"""Literal matching modes: exact / prefix / suffix / substring.

Scoring is identical to Smith-Waterman on an anchored contiguous run
(/root/reference/src/literal/algo.rs:157-330). The reference's
two-rarest-byte SIMD seed scan is a pure throughput optimization; here we
scan candidate positions directly (Arrow batches amortize this in the
vectorized layer)."""

from __future__ import annotations

from .config import Config, Matching, Scoring
from .oracle import case_needle, case_needle_unicode


def _is_delimiter(b: int) -> bool:
    """literal/algo.rs:327-330."""
    return b <= 127 and not (
        ord("a") <= b <= ord("z") or ord("A") <= b <= ord("Z") or ord("0") <= b <= ord("9")
    )


class LiteralMatcher:
    """Per-needle compiled literal matcher (literal/algo.rs:29-325)."""

    def __init__(self, needle: str, config: Config):
        scoring = config.scoring
        self._guard(len(needle.encode("utf-8")), scoring)
        self.mode = config.matching
        self.scoring = scoring
        case_sensitive = config.casing.respects_case_for(needle)
        self.unicode = config.unicode.respects_unicode_for(needle)
        self.needle_bytes = needle.encode("utf-8")
        self.needle_len = len(self.needle_bytes)
        self.needle_ascii = case_needle(self.needle_bytes, case_sensitive)
        self.needle_unicode = case_needle_unicode(needle, case_sensitive)

    @staticmethod
    def _guard(needle_len: int, scoring: Scoring) -> None:
        """literal/algo.rs:315-324."""
        max_bonus = min(
            0xFFFF,
            max(scoring.capitalization_bonus, scoring.delimiter_bonus)
            + scoring.matching_case_bonus,
        )
        scoring.guard_against_score_overflow(needle_len, max_bonus, 0)

    def _matches_at(self, haystack: bytes, pos: int) -> bool:
        """literal/algo.rs:157-178."""
        if self.unicode:
            k = pos
            for c in self.needle_unicode:
                piece = haystack[k : k + c.length]
                if piece != c.chars and piece != c.flipped_chars:
                    return False
                k += c.length
            return True
        for k, (orig, flipped) in enumerate(self.needle_ascii):
            b = haystack[pos + k]
            if b != orig and b != flipped:
                return False
        return True

    def _score_scalar(self, haystack: bytes, start: int, matched_exact_case: bool) -> int:
        """literal/algo.rs:180-202."""
        s = self.scoring
        score = s.match_score
        if matched_exact_case:
            score += s.matching_case_bonus
        if start == 0:
            score += s.prefix_bonus
        else:
            byte = haystack[start]
            prev = haystack[start - 1]
            if ord("A") <= byte <= ord("Z") and ord("a") <= prev <= ord("z"):
                score += s.capitalization_bonus
            if _is_delimiter(prev) and not _is_delimiter(byte):
                score += s.delimiter_bonus
        return score

    def _score_at(self, haystack: bytes, pos: int) -> int:
        """literal/algo.rs:204-227."""
        score = 0
        if self.unicode:
            start = pos
            for c in self.needle_unicode:
                exact_case = haystack[start : start + c.length] == c.chars
                score += self._score_scalar(haystack, start, exact_case)
                start += c.length
        else:
            for k, (orig, _flipped) in enumerate(self.needle_ascii):
                start = pos + k
                score += self._score_scalar(haystack, start, haystack[start] == orig)
        if pos == 0 and self.needle_len == len(haystack):
            score += self.scoring.exact_match_bonus
        return min(0xFFFF, score)

    def find(self, haystack: bytes) -> tuple[int, int] | None:
        """Returns (pos, score) of the best match under the configured mode
        (literal/algo.rs:229-313); substring prefers the highest score,
        earliest position on ties."""
        if len(haystack) < self.needle_len:
            return None
        if self.mode is Matching.EXACT:
            if len(haystack) == self.needle_len and self._matches_at(haystack, 0):
                return (0, self._score_at(haystack, 0))
            return None
        if self.mode is Matching.PREFIX:
            if self._matches_at(haystack, 0):
                return (0, self._score_at(haystack, 0))
            return None
        if self.mode is Matching.SUFFIX:
            pos = len(haystack) - self.needle_len
            if self._matches_at(haystack, pos):
                return (pos, self._score_at(haystack, pos))
            return None
        if self.mode is Matching.SUBSTRING:
            best: tuple[int, int] | None = None
            for pos in range(len(haystack) - self.needle_len + 1):
                if self._matches_at(haystack, pos):
                    score = self._score_at(haystack, pos)
                    if best is None or score > best[1]:
                        best = (pos, score)
            return best
        raise ValueError("fuzzy matching does not use the literal matcher")

    def match_one(self, haystack: bytes) -> tuple[int, bool, list[int]] | None:
        """Returns (score, exact, indices-reverse-order) (literal/algo.rs:98-155)."""
        found = self.find(haystack)
        if found is None:
            return None
        pos, score = found
        exact = pos == 0 and self.needle_len == len(haystack)
        indices = list(range(pos + self.needle_len - 1, pos - 1, -1))
        return (score, exact, indices)
