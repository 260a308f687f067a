"""Arrow-batched pandas UDFs wrapping the vectorized kernel.

Per BASELINE.json input_hint: vectorized pandas/Arrow UDFs throughout, no
per-row Python on the hot path. The compiled needle + config are plain
Python constants captured in the UDF closure at plan time and shipped to
executors once per task."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    StructField,
    StructType,
)

from .core.config import Config

MATCH_STRUCT = StructType(
    [
        StructField("matched", BooleanType(), False),
        StructField("score", IntegerType(), False),
        StructField("exact", BooleanType(), False),
        StructField("end_col", IntegerType(), False),
    ]
)


def fuzzy_match_udf(
    needle: str, config: Config | None = None, with_end_col: bool = False
):
    """Returns a pandas UDF text -> struct(matched, score, exact, end_col)
    running the full frizbee row pipeline (length filter -> prefilter ->
    window trim -> SW -> exact bonus) batched across the Arrow batch.
    `end_col` is the haystack offset of the final matched position
    (src/lib.rs:150-152, `match_end_col` feature surface); pass
    `with_end_col=True` when the caller projects it — oversized haystacks
    then pay the reference's feature-gated second greedy pass, and report
    0 otherwise."""
    config = config or Config()

    @pandas_udf(MATCH_STRUCT)
    def _match(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        from .kernel import match_batch

        filled = texts.fillna("")
        res = match_batch(needle, filled.tolist(), config, with_end_col)
        end_col = (
            res.end_col
            if res.end_col is not None
            else np.zeros(len(filled), dtype="uint16")
        )
        return pd.DataFrame(
            {
                "matched": res.matched & texts.notna().to_numpy(),
                "score": res.score.astype("int32"),
                "exact": res.exact,
                "end_col": end_col.astype("int32"),
            }
        )

    # nondeterministic marker (optimization guide §4.4): the caller filters
    # on the UDF's `matched` field and projects its score/exact fields, and
    # the optimizer's pushed-down filter otherwise DUPLICATES the UDF —
    # one ArrowEvalPython below the filter and a second one re-scoring every
    # surviving row for the projection (observed in the round-6 before
    # plans). The marker forbids the copy, yielding a single eval per row;
    # the kernel is a pure function, so no semantics change.
    return _match.asNondeterministic()


def fuzzy_match_indices_udf(needle: str, config: Config | None = None):
    """pandas UDF text -> struct(matched, score, exact, indices) — matched
    haystack byte offsets in reverse order (MatchIndices, src/lib.rs:189-199).

    Like the reference's match_list_indices this path is for display-sized
    result sets (traceback is per-row by nature); run it after match_list
    has narrowed the rows."""
    config = config or Config()

    from pyspark.sql.types import ArrayType

    schema = StructType(
        [
            StructField("matched", BooleanType(), False),
            StructField("score", IntegerType(), False),
            StructField("exact", BooleanType(), False),
            StructField("indices", ArrayType(IntegerType()), True),
        ]
    )

    @pandas_udf(schema)
    def _match(texts: pd.Series) -> pd.DataFrame:
        from .core.matcher import Matcher

        matcher = Matcher(needle, config)
        matched, scores, exacts, indices = [], [], [], []
        for t in texts.fillna(""):
            m = matcher.match_one_indices(t, 0)
            matched.append(m is not None)
            scores.append(m.score if m else 0)
            exacts.append(m.exact if m else False)
            indices.append(list(m.indices) if m else None)
        return pd.DataFrame(
            {"matched": matched, "score": scores, "exact": exacts, "indices": indices}
        )

    # see fuzzy_match_udf: forbid the optimizer's filter/projection UDF copy
    return _match.asNondeterministic()


def multi_pattern_match_udf(patterns, config: Config | None = None):
    """One-pass multi-pattern scorer: text -> struct(matched, score, exact,
    end_col) implementing the AND-of-atoms / score-sum / exact-OR /
    negated-anti semantics of the reference's multi-pattern matcher
    (src/matcher/multi.rs:84-152) inside a SINGLE Arrow transfer.

    Survivor refinement happens via numpy masks inside the batch: pattern
    i+1's kernel only scores the rows that survived patterns 0..i — the
    same work reduction as the reference's per-pattern loop — but the text
    column crosses the JVM<->Python boundary ONCE instead of once per
    atom, and the plan is a single ArrowEval stage instead of N stages
    separated by optimizer barriers (the round-3 chain measured 2-4x the
    single-pass wall on 3-atom queries). `patterns` is a list of
    (needle, resolved_config, negated) triples, resolved at plan time.

    Null rule (ADVICE r4, now the documented contract): a NULL text row
    never matches — in the single-pattern path (`fuzzy_match_udf` masks
    `matched` with notna) and here alike, INCLUDING all-negated queries
    like `!foo` (null is unknown content, not empty content; `alive`
    starts as notna so a null row cannot survive to the output). An
    empty-string row, by contrast, is real content and e.g. survives
    `!foo`. tests/test_spark_match.py pins both paths.

    end_col is reported for the LAST non-negated atom that matched (the
    reference's multi-pattern API exposes no end_col; this surface is for
    the single-pattern path and reports 0 ambiguity-free only there)."""
    compiled = [
        (needle, cfg, negated) for needle, cfg, negated in patterns
    ]

    @pandas_udf(MATCH_STRUCT)
    def _match(texts: pd.Series) -> pd.DataFrame:
        import numpy as np

        from .kernel import match_batch

        filled = texts.fillna("")
        texts_list = filled.tolist()
        n = len(texts_list)
        alive = texts.notna().to_numpy().copy()
        score = np.zeros(n, dtype=np.int64)
        exact = np.zeros(n, dtype=bool)
        end_col = np.zeros(n, dtype=np.int32)
        for needle, cfg, negated in compiled:
            idxs = np.nonzero(alive)[0]
            if len(idxs) == 0:
                break
            res = match_batch(needle, [texts_list[i] for i in idxs], cfg)
            if negated:
                alive[idxs[res.matched]] = False
                continue
            alive[idxs[~res.matched]] = False
            keep = idxs[res.matched]
            score[keep] += res.score[res.matched].astype(np.int64)
            exact[keep] |= res.exact[res.matched]
            if res.end_col is not None:
                end_col[keep] = res.end_col[res.matched].astype(np.int32)
        # saturating u16 sum (operators sum scores the same way)
        score = np.minimum(score, 0xFFFF).astype(np.int32)
        return pd.DataFrame(
            {
                "matched": alive,
                "score": np.where(alive, score, 0).astype(np.int32),
                "exact": alive & exact,
                "end_col": np.where(alive, end_col, 0).astype(np.int32),
            }
        )

    # see fuzzy_match_udf: forbid the optimizer's filter/projection UDF copy
    return _match.asNondeterministic()


def score_pairs_udf(config: Config | None = None):
    """Returns a pandas UDF (needle_text, haystack_text) -> score for
    candidate-pair verification in the dedup pipeline. Pairs are grouped by
    needle within a batch so each distinct needle compiles once and scores
    its haystacks vectorized."""
    config = config or Config()

    @pandas_udf(IntegerType())
    def _score(needles: pd.Series, haystacks: pd.Series) -> pd.Series:
        from collections import defaultdict

        import numpy as np

        from .kernel import match_batch

        nl = needles.fillna("").to_numpy()
        hl = haystacks.fillna("").to_numpy()
        out = np.full(len(nl), -1, dtype="int32")
        groups: dict[str, list[int]] = defaultdict(list)
        for pos, n in enumerate(nl):
            groups[n].append(pos)
        for needle, positions in groups.items():
            res = match_batch(needle, [hl[p] for p in positions], config)
            out[positions] = np.where(res.matched, res.score.astype("int32"), -1)
        return pd.Series(out)

    return _score
