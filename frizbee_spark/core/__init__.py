from .config import (
    CaseMatching,
    Config,
    Matching,
    PatternConfig,
    Scoring,
    SortStrategy,
    UnicodeMatching,
)

__all__ = [
    "CaseMatching",
    "Config",
    "Matching",
    "PatternConfig",
    "Scoring",
    "SortStrategy",
    "UnicodeMatching",
]
