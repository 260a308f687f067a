"""End-to-end match-list semantics: compile → length filter → prefilter →
window trim → score (+ exact bonus) → order.

Mirrors /root/reference/src/matcher/{mod.rs:105-221, algo.rs:56-338,
multi.rs:29-152}. This scalar implementation defines the row-level contract;
the Spark operators in frizbee_spark.operators reproduce it with vectorized
pandas UDFs and DataFrame sorts."""

from __future__ import annotations

from dataclasses import dataclass

from .config import Config, Matching
from .literal import LiteralMatcher
from .oracle import (
    match_greedy,
    score_haystack,
    score_haystack_indices,
)
from .pattern import Pattern
from .prefilter import prefilter_ascii, prefilter_unicode, trim_haystack

U16_MAX = 0xFFFF


@dataclass(frozen=True)
class Match:
    score: int
    index: int
    exact: bool


@dataclass(frozen=True)
class MatchIndices:
    score: int
    index: int
    exact: bool
    indices: tuple[int, ...]


class _CompiledPattern:
    """One compiled pattern: fuzzy or literal backend (matcher/mod.rs:193-204)."""

    def __init__(self, source: Pattern, config: Config):
        resolved = source.config.resolve(config)
        self.negated = source.negated
        self.needle = source.needle
        self.config = resolved
        self.needle_bytes = source.needle.encode("utf-8")
        self.case_sensitive = resolved.casing.respects_case_for(source.needle)
        self.needs_unicode = resolved.unicode.respects_unicode_for(source.needle)
        self.max_typos = resolved.max_typos
        self.is_literal = not resolved.matching.is_fuzzy
        if self.is_literal:
            self.literal = LiteralMatcher(source.needle, resolved)
        else:
            # min-length filter (matcher/algo.rs:62-65)
            n_chars = len(source.needle)
            self.min_haystack_len = (
                max(0, n_chars - resolved.max_typos) if resolved.max_typos is not None else 0
            )
            scoring = resolved.scoring
            needle_len = n_chars if self.needs_unicode else len(self.needle_bytes)
            scoring.guard_against_score_overflow(
                needle_len, scoring.max_per_char_bonus(), scoring.max_one_time_bonus()
            )

    # -- fuzzy row pipeline (matcher/algo.rs:78-103) --

    def _prefilter(self, haystack: bytes) -> tuple[bool, int, int]:
        if self.max_typos is None:
            return (True, 0, len(haystack))
        if self.needs_unicode:
            return prefilter_unicode(
                self.needle, haystack, self.max_typos, self.case_sensitive
            )
        return prefilter_ascii(
            self.needle_bytes, haystack, self.max_typos, self.case_sensitive
        )

    def match_one(self, haystack: str, index: int) -> Match | None:
        hay = haystack.encode("utf-8")
        if self.is_literal:
            res = self.literal.match_one(hay)
            if res is None:
                return None
            score, exact, _ = res
            return Match(score=score, index=index, exact=exact)

        if len(hay) < self.min_haystack_len:
            return None
        matched, start, end = self._prefilter(hay)
        if not matched:
            return None
        trimmed, start_pos, include_exact = trim_haystack(hay, start, end)
        score = score_haystack(
            self.needle_bytes,
            trimmed,
            self.config.scoring,
            self.case_sensitive,
            include_prefix=start_pos == 0,
            unicode=self.needs_unicode,
        ).score
        exact = include_exact and self.needle_bytes == trimmed
        if exact:
            score = min(U16_MAX, score + self.config.scoring.exact_match_bonus)
        return Match(score=score, index=index, exact=exact)

    def match_one_indices(self, haystack: str, index: int) -> MatchIndices | None:
        hay = haystack.encode("utf-8")
        if self.is_literal:
            res = self.literal.match_one(hay)
            if res is None:
                return None
            score, exact, indices = res
            return MatchIndices(score=score, index=index, exact=exact, indices=tuple(indices))

        if len(hay) < self.min_haystack_len:
            return None
        matched, start, end = self._prefilter(hay)
        if not matched:
            return None
        trimmed, start_pos, include_exact = trim_haystack(hay, start, end)
        score, indices = score_haystack_indices(
            self.needle_bytes,
            trimmed,
            self.config.scoring,
            self.case_sensitive,
            haystack_start_pos=start_pos,
            max_typos=self.max_typos,
            unicode=self.needs_unicode,
        )
        exact = include_exact and self.needle_bytes == trimmed
        if exact:
            score = min(U16_MAX, score + self.config.scoring.exact_match_bonus)
        return MatchIndices(score=score, index=index, exact=exact, indices=tuple(indices))


class Matcher:
    """Reference-parity matcher over Python lists (matcher/mod.rs)."""

    def __init__(self, needle_or_patterns, config: Config | None = None):
        config = config or Config()
        self.config = config
        if isinstance(needle_or_patterns, str):
            patterns = [Pattern.new(needle_or_patterns)]
        else:
            patterns = list(needle_or_patterns)
        self.patterns = [
            _CompiledPattern(p, config) for p in patterns if p.needle
        ]

    @staticmethod
    def from_query(query: str, config: Config | None = None) -> "Matcher":
        return Matcher(Pattern.parse_query(query), config)

    # -- multi-pattern AND / negation (matcher/multi.rs:29-54) --

    def match_one(self, haystack: str, index: int) -> Match | None:
        if not self.patterns:
            return Match(score=0, index=index, exact=False)
        combined = Match(score=0, index=index, exact=False)
        for pattern in self.patterns:
            result = pattern.match_one(haystack, index)
            if pattern.negated:
                if result is not None:
                    return None
            else:
                if result is None:
                    return None
                combined = Match(
                    score=min(U16_MAX, combined.score + result.score),
                    index=index,
                    exact=combined.exact or result.exact,
                )
        return combined

    def match_one_indices(self, haystack: str, index: int) -> MatchIndices | None:
        if not self.patterns:
            return MatchIndices(score=0, index=index, exact=False, indices=())
        combined_score = 0
        combined_exact = False
        combined_indices: list[int] = []
        for pattern in self.patterns:
            if pattern.negated:
                if pattern.match_one(haystack, index) is not None:
                    return None
            else:
                m = pattern.match_one_indices(haystack, index)
                if m is None:
                    return None
                combined_score = min(U16_MAX, combined_score + m.score)
                combined_exact = combined_exact or m.exact
                combined_indices.extend(m.indices)
        # reverse order, deduped (multi.rs:75-78)
        merged = tuple(sorted(set(combined_indices), reverse=True))
        return MatchIndices(
            score=combined_score, index=index, exact=combined_exact, indices=merged
        )

    def _order(self, matches: list) -> list:
        """Sort per SortStrategy (matcher/mod.rs:215-221): reverse for desc
        index order, then stable sort by score desc."""
        sort = self.config.sort
        if sort.is_reversed:
            matches = list(reversed(matches))
        if self.patterns and sort.is_by_score:
            matches = sorted(matches, key=lambda m: -m.score)  # stable
        return matches

    def match_list(self, haystacks: list[str]) -> list[Match]:
        matches = [
            m
            for i, h in enumerate(haystacks)
            if (m := self.match_one(h, i)) is not None
        ]
        return self._order(matches)

    def match_list_indices(self, haystacks: list[str]) -> list[MatchIndices]:
        matches = [
            m
            for i, h in enumerate(haystacks)
            if (m := self.match_one_indices(h, i)) is not None
        ]
        sort = self.config.sort
        if sort.is_reversed:
            matches = list(reversed(matches))
        if sort.is_by_score:
            matches = sorted(matches, key=lambda m: -m.score)
        return matches
