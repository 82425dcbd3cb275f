"""[beyond-ref] Production-depth BPE apply (VERDICT r12 #5): the
learn-on-bounded-sample / apply-distributed split at REAL vocabulary
sizes.

The chained-replace apply (plans/analytics_queries._bpe_apply_expr)
nests one expression per merge — proven at R=4, but a 32k-merge
production vocabulary overflows expression/codegen depth and the
documented fallback (a ~R/64 scan-chain) rewrites the corpus hundreds
of times. This module is the scale path:

- ``learn_merges_local``: the merge table is learned DRIVER-SIDE in
  pure Python over the bounded deterministic sample (the same
  2048-doc smallest-md5 ordered take the sampled learner uses) —
  constant work at any corpus size, zero Spark jobs per round, and
  bit-identical merges to the Spark/SQL learners (same pair counting,
  same (count desc, a asc, b asc) tie-break, same two-pass
  leftmost-replace application between rounds).
- ``apply_merges_totals``: ONE Arrow ``mapInPandas`` pass over the
  full corpus applies ALL R merges — scan count is R-INDEPENDENT (the
  merge table rides the closure; pattern application is C-fast
  ``str.replace``, memoized per unique token so work tracks the batch
  VOCABULARY, not the token count — the Zipf trick every production
  tokenizer uses). Emits per-document symbol totals after each merge
  prefix, so every per-round n_applied falls out of the same pass.

Cross-engine exactness: each merge applies as the IDENTICAL two-pass
leftmost-nonoverlapping literal replace the JVM form uses
(``replace(replace(w, ' a b ', ' ab '))``) — Python ``str.replace``
and Spark's ``F.replace`` share those semantics, so per-doc totals are
integer-equal to the chained-expression apply (asserted by
``test_properties.test_bpe_mapinpandas_apply_equals_chained_replace``
and by the registered query's DuckDB oracle, which replays the same
replaces in SQL).

At 100 TB: the sample collect is 2048 rows by construction; the merge
table is kilobytes in the task closure; the corpus pass is Arrow-
batched and embarrassingly parallel with no shuffle at all (the only
aggregation is the R+1-column sum that follows).
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tokens shorter than this never enter the working corpus — the same
#: guard the Spark learners and the SQL oracles apply
MIN_TOKEN_LEN = 2


def _word(token: str) -> str:
    return " " + " ".join(token) + " "


def _apply_one(w: str, a: str, b: str) -> str:
    """The exact two-pass leftmost-nonoverlapping replace of
    ``_bpe_apply_expr`` — pass 2 catches the matches whose leading
    space pass 1 consumed."""
    pat = f" {a} {b} "
    rep = f" {a}{b} "
    return w.replace(pat, rep).replace(pat, rep)


def learn_merges_local(
    texts: list[str], rounds: int
) -> list[tuple[int, str, str, int]]:
    """Greedy BPE merge learning over an in-memory (BOUNDED) sample:
    ``rounds`` rows of (round, pair_a, pair_b, pair_count). Pair counts
    weight by token OCCURRENCE (the working corpus keeps one row per
    token instance), matching the Spark learners exactly; ties break
    (count desc, a asc, b asc) — ASCII-safe string order shared by
    Spark, DuckDB, and Python."""
    words: Counter[str] = Counter()
    for text in texts:
        for t in text.split(" "):
            if len(t) >= MIN_TOKEN_LEN:
                words[_word(t)] += 1
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        pc: Counter[tuple[str, str]] = Counter()
        for w, cnt in words.items():
            s = w.split()
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt
        if not pc:
            break
        (a, b), n = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, a, b, int(n)))
        nxt: Counter[str] = Counter()
        for w, cnt in words.items():
            nxt[_apply_one(w, a, b)] += cnt
        words = nxt
    return merges


def apply_merges_totals(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    track_prefixes: bool = True,
) -> DataFrame:
    """One Arrow pass over the full corpus: (doc_id, t0..tR) where
    ``t_i`` is the document's symbol total after the first i merges —
    so ``n_applied`` for round r is Σ(t_{r-1} − t_r). With
    ``track_prefixes=False`` only (doc_id, t0, tR) is emitted (the
    depth-measurement mode: skips R−1 intermediate ``split`` counts
    per unique token, which dominate at R≥256)."""
    n = len(merges)
    steps = list(range(n + 1)) if track_prefixes else [0, n]
    cols = [f"t{i}" for i in steps]
    schema = f"{id_col} bigint, " + ", ".join(f"{c} bigint" for c in cols)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[int]] = {}

        def token_sizes(t: str) -> list[int]:
            sz = cache.get(t)
            if sz is None:
                w = _word(t)
                sz = [len(t)]
                for i, (a, b) in enumerate(merges, start=1):
                    w = _apply_one(w, a, b)
                    if track_prefixes or i == n:
                        sz.append(len(w.split()))
                cache[t] = sz
            return sz

        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                totals = [0] * len(steps)
                for t in text.split(" "):
                    if len(t) >= MIN_TOKEN_LEN:
                        sz = token_sizes(t)
                        for j in range(len(steps)):
                            totals[j] += sz[j]
                out.append((doc_id, *totals))
            yield pd.DataFrame(out, columns=[id_col, *cols])

    from .skew import spread_for_compute

    # interpreted per-token merge replay is the definition of
    # compute-dense; widen a narrow scan before the Python boundary
    # (guide §2.5 / §4 — no-op when the scan is already parallel)
    return spread_for_compute(docs.select(id_col, text_col)).mapInPandas(
        run, schema=schema
    )
