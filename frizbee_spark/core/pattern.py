"""Query-atom parsing: `foo 'foo ^foo foo$ ^foo$ !foo` with backslash
escapes (/root/reference/src/pattern.rs:100-222)."""

from __future__ import annotations

from dataclasses import dataclass, field

from .config import Matching, PatternConfig


@dataclass
class Pattern:
    pattern: str
    negated: bool
    needle: str
    config: PatternConfig = field(default_factory=PatternConfig)

    @staticmethod
    def new(needle: str, config: PatternConfig | None = None, negated: bool = False) -> "Pattern":
        return Pattern(
            pattern=needle, negated=negated, needle=needle, config=config or PatternConfig()
        )

    @staticmethod
    def parse(atom: str) -> "Pattern":
        """pattern.rs:100-165."""
        tokens: list[tuple[str, bool]] = []
        it = iter(atom)
        for c in it:
            if c == "\\":
                nxt = next(it, None)
                if nxt is not None:
                    tokens.append((nxt, True))
                else:
                    tokens.append((c, False))
            else:
                tokens.append((c, False))

        rest = tokens

        def strip_first(op: str) -> bool:
            nonlocal rest
            if rest and rest[0] == (op, False):
                rest = rest[1:]
                return True
            return False

        def strip_last(op: str) -> bool:
            nonlocal rest
            if rest and rest[-1] == (op, False):
                rest = rest[:-1]
                return True
            return False

        negated = strip_first("!")
        prefix = strip_first("^")
        substring = (not prefix) and strip_first("'")
        suffix = strip_last("$")

        def is_special(c: str) -> bool:
            return c in "!^'$" or c.isspace()

        needle_parts = []
        for c, escaped in rest:
            if escaped and not is_special(c):
                needle_parts.append("\\")
            needle_parts.append(c)
        needle = "".join(needle_parts)

        if prefix and suffix:
            matching = Matching.EXACT
        elif prefix:
            matching = Matching.PREFIX
        elif suffix:
            matching = Matching.SUFFIX
        elif substring:
            matching = Matching.SUBSTRING
        elif negated:
            # bare negated atoms match substrings, like fzf and nucleo
            matching = Matching.SUBSTRING
        else:
            matching = None

        return Pattern(
            pattern=atom,
            negated=negated,
            needle=needle,
            config=PatternConfig(matching=matching),
        )

    @staticmethod
    def parse_query(query: str) -> list["Pattern"]:
        """Whitespace-separated atoms, `\\ ` escapes a literal space; atoms
        with empty needles are dropped (pattern.rs:190-222)."""
        patterns: list[Pattern] = []
        start: int | None = None
        escaped = False

        def push(atom: str) -> None:
            p = Pattern.parse(atom)
            if p.needle:
                patterns.append(p)

        for i, c in enumerate(query):
            if escaped:
                escaped = False
            elif c == "\\":
                if start is None:
                    start = i
                escaped = True
            elif c.isspace():
                if start is not None:
                    push(query[start:i])
                    start = None
            elif start is None:
                start = i
        if start is not None:
            push(query[start:])
        return patterns
