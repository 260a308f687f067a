"""Ordered-containment prefilter: membership + conservative windows.

Membership semantics are the reference's documented contract
(/root/reference/src/prefilter/mod.rs:1-13 and its oracle tests at
mod.rs:1013-1066): a haystack matches with `max_typos = k` iff an ordered
alignment exists after deleting at most k needle units (bytes on the ASCII
path, codepoints on the unicode path) — equivalently
``LCS(needle, haystack) + k >= len(needle)``.

Window semantics (backend-independent, asserted so by the reference's
parity tests at mod.rs:914-1011):

- start: the first haystack position where any of the first ``k+1`` needle
  units occurs (the k+1 scan paths begin at needle indices 0..=k;
  ascii.rs:29-31, ascii_typos.rs:64-96,317-331).
- end (k = 0): one past the last occurrence of the final needle unit
  (ascii.rs:36-47 last-chunk case and the back-scan at ascii.rs:57-72 agree
  on this because the greedy match position is itself an occurrence).
- end (k > 0): one past the last occurrence of any of the last ``k+1``
  needle units, or ``len`` when none occurs (ascii_typos.rs:375-397).

The prefilter can produce score-level false positives but never rejects a
haystack Smith-Waterman could accept.
"""

from __future__ import annotations

from .oracle import UnicodeChar, case_needle, case_needle_unicode

Window = tuple[bool, int, int]


def _lcs_len(needle_units: list, haystack_units: list, match) -> int:
    """O(n*m) LCS with a caller-supplied unit matcher (mod.rs:1027-1047)."""
    prev = [0] * (len(haystack_units) + 1)
    cur = [0] * (len(haystack_units) + 1)
    for nu in needle_units:
        cur[0] = 0
        for idx, hu in enumerate(haystack_units):
            if match(nu, hu):
                cur[idx + 1] = prev[idx] + 1
            else:
                cur[idx + 1] = max(prev[idx + 1], cur[idx])
        prev, cur = cur, prev
    return prev[len(haystack_units)]


def prefilter_ascii(
    needle: bytes, haystack: bytes, max_typos: int, case_sensitive: bool
) -> Window:
    """ASCII byte-unit prefilter with window (prefilter/algo/ascii.rs,
    ascii_typos.rs)."""
    n = len(needle)
    if max_typos >= n:
        return (True, 0, len(haystack))
    if len(haystack) == 0:
        return (False, 0, 0)

    pairs = case_needle(needle, case_sensitive)

    def matches(pair: tuple[int, int], h: int) -> bool:
        return h == pair[0] or h == pair[1]

    hay = list(haystack)

    if max_typos == 0:
        # greedy forward subsequence scan (ascii.rs:19-53)
        pos = -1
        first_pos = None
        for pair in pairs:
            pos = next(
                (j for j in range(pos + 1, len(hay)) if matches(pair, hay[j])), None
            )
            if pos is None:
                return (False, first_pos or 0, len(haystack))
            if first_pos is None:
                first_pos = pos
        last_pair = pairs[-1]
        end = max(j for j in range(pos, len(hay)) if matches(last_pair, hay[j])) + 1
        return (True, first_pos, end)

    matched = _lcs_len(pairs, hay, matches) + max_typos >= n
    head = pairs[: max_typos + 1]
    start_hits = [
        j for j, h in enumerate(hay) if any(matches(p, h) for p in head)
    ]
    start = start_hits[0] if start_hits else 0
    tail = pairs[n - 1 - max_typos :]
    end_hits = [j for j, h in enumerate(hay) if any(matches(p, h) for p in tail)]
    end = (end_hits[-1] + 1) if end_hits else len(haystack)
    return (matched, start, end)


def prefilter_unicode(
    needle: str, haystack: bytes, max_typos: int, case_sensitive: bool
) -> Window:
    """Codepoint-unit prefilter returning byte windows
    (prefilter/algo/unicode.rs, unicode_typos.rs)."""
    chars = case_needle_unicode(needle, case_sensitive)
    n = len(chars)
    if max_typos >= n:
        return (True, 0, len(haystack))
    if len(haystack) == 0:
        return (False, 0, 0)

    # Haystack byte offsets of each occurrence window per needle char.
    def occurrences(c: UnicodeChar) -> list[int]:
        out = []
        j = 0
        while j <= len(haystack) - c.length:
            piece = haystack[j : j + c.length]
            if piece == c.chars or piece == c.flipped_chars:
                out.append(j)
            j += 1
        return out

    try:
        hay_str = haystack.decode("utf-8")
    except UnicodeDecodeError:
        hay_str = haystack.decode("utf-8", errors="replace")

    def char_match(nc: UnicodeChar, hc: str) -> bool:
        hb = hc.encode("utf-8")
        return hb == nc.chars or hb == nc.flipped_chars

    hay_chars = list(hay_str)

    if max_typos == 0:
        # greedy forward codepoint-sequence scan over byte positions
        pos = 0
        first_pos = None
        last_match = 0
        for c in chars:
            found = None
            j = pos
            while j <= len(haystack) - c.length:
                piece = haystack[j : j + c.length]
                if piece == c.chars or piece == c.flipped_chars:
                    found = j
                    break
                j += 1
            if found is None:
                return (False, first_pos or 0, len(haystack))
            if first_pos is None:
                first_pos = found
            last_match = found
            pos = found + c.length
        last_char = chars[-1]
        occ = [j for j in occurrences(last_char) if j >= last_match]
        end = occ[-1] + last_char.length
        return (True, first_pos, end)

    matched = _lcs_len(chars, hay_chars, char_match) + max_typos >= n
    head = chars[: max_typos + 1]
    start_positions = [o for c in head for o in occurrences(c)]
    start = min(start_positions) if start_positions else 0
    tail = chars[n - 1 - max_typos :]
    end_positions = [o + c.length for c in tail for o in occurrences(c)]
    end = max(end_positions) if end_positions else len(haystack)
    return (matched, start, end)


def trim_haystack(haystack: bytes, start_pos: int, end_pos: int) -> tuple[bytes, int, bool]:
    """Trim to the prefilter window, keeping one byte of delimiter-bonus
    context; include_exact iff the window covers the full haystack
    (matcher/algo.rs:331-338)."""
    start_pos = max(0, start_pos - 1)
    include_exact = start_pos == 0 and end_pos == len(haystack)
    return haystack[start_pos:end_pos], start_pos, include_exact
