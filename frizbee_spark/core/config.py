"""Configuration model for the frizbee-compatible scoring engine.

Mirrors the reference's public config surface (/root/reference/src/lib.rs:236-478
and /root/reference/src/const.rs:1-10) as plain Python dataclasses. These are
plan-time constants: they are pickled into Spark pandas UDF closures and
broadcast to executors, never evaluated per row.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from enum import Enum

# Default scoring knobs (reference: src/const.rs:1-10)
MATCH_SCORE = 12
MISMATCH_PENALTY = 6
GAP_OPEN_PENALTY = 5
GAP_EXTEND_PENALTY = 1
PREFIX_BONUS = 12
DELIMITER_BONUS = 4
CAPITALIZATION_BONUS = 4
MATCHING_CASE_BONUS = 4
EXACT_MATCH_BONUS = 8

#: Haystacks longer than this bypass the SW matrix and use the greedy scorer
#: (reference: src/smith_waterman/algo/mod.rs:18)
MAX_HAYSTACK_LEN = 1024

U16_MAX = 0xFFFF


class CaseMatching(Enum):
    """How case sensitivity is handled (reference: src/lib.rs:356-377)."""

    IGNORE = "ignore"
    SMART = "smart"
    RESPECT = "respect"

    def respects_case_for(self, needle: str) -> bool:
        if self is CaseMatching.IGNORE:
            return False
        if self is CaseMatching.SMART:
            return any(c.isupper() for c in needle)
        return True


class UnicodeMatching(Enum):
    """How unicode is handled (reference: src/lib.rs:379-401)."""

    IGNORE = "ignore"
    SMART = "smart"
    ALWAYS = "always"

    def respects_unicode_for(self, needle: str) -> bool:
        if self is UnicodeMatching.IGNORE:
            return False
        if self is UnicodeMatching.SMART:
            return not needle.isascii()
        return True


class Matching(Enum):
    """Matching algorithm selection (reference: src/lib.rs:403-434)."""

    FUZZY = "fuzzy"
    EXACT = "exact"
    PREFIX = "prefix"
    SUFFIX = "suffix"
    SUBSTRING = "substring"

    @property
    def is_fuzzy(self) -> bool:
        return self is Matching.FUZZY


class SortStrategy(Enum):
    """Result ordering (reference: src/lib.rs:311-354)."""

    SCORE_THEN_INDEX_ASC = "score_then_index_asc"
    SCORE_THEN_INDEX_DESC = "score_then_index_desc"
    INDEX_ASC = "index_asc"
    INDEX_DESC = "index_desc"

    @property
    def is_reversed(self) -> bool:
        return self in (SortStrategy.INDEX_DESC, SortStrategy.SCORE_THEN_INDEX_DESC)

    @property
    def is_by_score(self) -> bool:
        return self in (
            SortStrategy.SCORE_THEN_INDEX_ASC,
            SortStrategy.SCORE_THEN_INDEX_DESC,
        )


@dataclass(frozen=True)
class Scoring:
    """Scoring knobs (reference: src/lib.rs:436-538)."""

    match_score: int = MATCH_SCORE
    mismatch_penalty: int = MISMATCH_PENALTY
    gap_open_penalty: int = GAP_OPEN_PENALTY
    gap_extend_penalty: int = GAP_EXTEND_PENALTY
    prefix_bonus: int = PREFIX_BONUS
    capitalization_bonus: int = CAPITALIZATION_BONUS
    matching_case_bonus: int = MATCHING_CASE_BONUS
    exact_match_bonus: int = EXACT_MATCH_BONUS
    delimiter_bonus: int = DELIMITER_BONUS

    def max_per_char_bonus(self) -> int:
        bonus = max(self.delimiter_bonus, self.capitalization_bonus)
        amortized = max(-(-bonus // 2), max(0, bonus - self.gap_open_penalty))
        return min(U16_MAX, amortized + self.matching_case_bonus)

    def max_one_time_bonus(self) -> int:
        bonus = max(self.delimiter_bonus, self.capitalization_bonus)
        amortized = max(-(-bonus // 2), max(0, bonus - self.gap_open_penalty))
        return bonus - amortized

    def max_needle_len(self) -> int:
        per_char = self.max_per_char_bonus()
        if per_char == 0:
            return U16_MAX
        return max(0, U16_MAX - self.max_one_time_bonus()) // per_char

    def guard_against_score_overflow(
        self, needle_len: int, max_bonus_per_char: int, max_one_time_bonus: int
    ) -> None:
        """Reference: src/lib.rs:506-537."""
        max_per_char = min(U16_MAX, self.match_score + max_bonus_per_char)
        if max_per_char == 0:
            return
        headroom = U16_MAX
        for sub in (
            self.prefix_bonus,
            self.exact_match_bonus,
            self.mismatch_penalty,
            max_one_time_bonus,
        ):
            headroom = max(0, headroom - sub)
        max_needle_len = headroom // max_per_char
        if needle_len > max_needle_len:
            raise ValueError(
                f"needle too long and could overflow the u16 score: "
                f"{needle_len} > {max_needle_len}"
            )
        max_gap_penalty = 32 * self.gap_extend_penalty + self.gap_open_penalty
        if max_gap_penalty > U16_MAX:
            raise ValueError(
                f"gap penalties too large and could overflow the u16 score: "
                f"{max_gap_penalty} > {U16_MAX}"
            )


@dataclass(frozen=True)
class Config:
    """Matcher config (reference: src/lib.rs:233-309)."""

    max_typos: int | None = 0
    casing: CaseMatching = CaseMatching.SMART
    unicode: UnicodeMatching = UnicodeMatching.SMART
    matching: Matching = Matching.FUZZY
    sort: SortStrategy = SortStrategy.SCORE_THEN_INDEX_ASC
    scoring: Scoring = field(default_factory=Scoring)

    def with_(self, **kwargs) -> Config:
        return replace(self, **kwargs)


@dataclass(frozen=True)
class PatternConfig:
    """Per-pattern overrides (reference: src/pattern.rs:227-293)."""

    max_typos: int | None = None
    casing: CaseMatching | None = None
    unicode: UnicodeMatching | None = None
    matching: Matching | None = None
    scoring: Scoring | None = None

    def resolve(self, config: Config) -> Config:
        return Config(
            max_typos=self.max_typos if self.max_typos is not None else config.max_typos,
            casing=self.casing or config.casing,
            unicode=self.unicode or config.unicode,
            matching=self.matching or config.matching,
            scoring=self.scoring or config.scoring,
            sort=config.sort,
        )
