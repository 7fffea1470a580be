"""Byte-pair-encoding tokenizer: distributed training + Arrow-batched
encoding (Sennrich et al., "Neural Machine Translation of Rare Words
with Subword Units", ACL 2016 — the GPT-2-style merge-rank tokenizer).

The engine's text tier counts tokens with a BPE-ish regex
(``operators/text.py``); this module TRAINS the merges themselves, the
step a from-scratch training-data pipeline runs once per corpus.

Distributed shape (the part that must survive 100 TB):

- ``bpe_train`` aggregates the corpus ONCE into a word-frequency table
  (the only pass over corpus text — distinct words are orders of
  magnitude fewer than tokens), then runs K driver-coordinated merge
  rounds over that DISTRIBUTED table, exactly the kmeans.py iteration
  pattern: each round is (a) a map-side pair-count explode + one
  partial-aggregated groupBy, (b) a ONE-ROW collect of the argmax pair
  (count desc, pair asc — lexicographic ties so the sequence is
  engine-independent), (c) a map-side JVM fold rewriting each word's
  token array (no Python, no shuffle — the rewrite is
  ``F.aggregate`` with a carried ``prev`` slot).  The word table is
  persisted per round and the previous round unpersisted; nothing
  driver-side ever exceeds one row per round.
- ``bpe_encode`` applies a trained merge list with one Arrow-batched
  ``mapInPandas`` pass: per word, lowest-rank adjacent pair merges
  first (the GPT-2 rank loop) — tokenization is inherently sequential
  per word, so this is the documented vectorized-Python seam; only the
  small rank table ships in the closure.

Correctness: tests/test_bpe.py pins the trained merge sequence against
an independent pure-Python reference implementation on real sf
documents (exact list equality, including tie rounds), the classic
Sennrich corpus anchor, encode/decode identity (concatenating a word's
tokens recovers the word), and encode-consistency (corpus words
tokenize into exactly the trained vocabulary).

Iterative + data-dependent control flow = not reasonably
SQL-expressible, so this operator is pytest-gated (the repo rule for
such ops), like the streaming tier.
"""

from __future__ import annotations

import re as _re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: End-of-word sentinel (Sennrich's ``</w>``): lets the tokenizer
#: distinguish word-final subwords, and makes decode unambiguous.
EOW = "</w>"


def _word_table(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, n) frequency table — the single pass over corpus text."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _initial_tokens() -> F.Column:
    """Character split + the end-of-word sentinel (delegates to the
    single definition in :func:`_word_tokens_expr` — two verbatim
    copies could drift and break train/encode parity, a review
    finding)."""
    return _word_tokens_expr(F.col("word"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, total) adjacent-pair frequencies, weighted by word count
    — map-side explode, one partial-aggregated groupBy."""
    pairs = F.zip_with(
        F.slice(F.col("toks"), 1, F.size("toks") - 1),
        F.slice(F.col("toks"), 2, F.size("toks") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        words.filter(F.size("toks") >= 2)
        .select("n", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("n").alias("total"))
    )


def _merge_expr(a: str, b: str, toks: F.Column | None = None) -> F.Column:
    """Rewrite a token array replacing every adjacent (a, b) with a+b —
    a single left fold carrying a one-token lookbehind (``prev``), so
    overlapping occurrences resolve left-to-right exactly like the
    reference implementation.  Pure JVM; no Python, no shuffle.
    ``toks`` defaults to the training word table's column; pass an
    arbitrary array column to chain rewrites (bpe_encode_relational).
    """
    la, lb = F.lit(a), F.lit(b)
    merged = F.lit(a + b)
    step = lambda acc, x: (  # noqa: E731
        F.when(
            acc["prev"].isNotNull() & (acc["prev"] == la) & (x == lb),
            F.struct(
                F.concat(acc["out"], F.array(merged)).alias("out"),
                F.lit(None).cast("string").alias("prev"),
            ),
        ).otherwise(
            F.struct(
                F.when(
                    acc["prev"].isNotNull(),
                    F.concat(acc["out"], F.array(acc["prev"])),
                )
                .otherwise(acc["out"])
                .alias("out"),
                x.alias("prev"),
            )
        )
    )
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )
    fin = lambda acc: F.when(  # noqa: E731
        acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
    ).otherwise(acc["out"])
    return F.aggregate(
        F.col("toks") if toks is None else toks, init, step, fin
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    *,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges over the corpus; returns the merge
    list in training order (rank = position).  Stops early when no
    adjacent pair reaches ``min_pair_count``.  Ties on count break
    lexicographically on (a, b) so the sequence is deterministic and
    engine-independent."""
    if n_merges < 1:
        raise ValueError("need n_merges >= 1")
    # localCheckpoint per round (the graph.py connected-components
    # pattern): each round's rewrite would otherwise NEST another
    # aggregate fold into the logical plan, and K rounds of lineage
    # blow up analysis/codegen (measured: driver OOM at K=30 with
    # plain persist+unpersist).  The checkpoint cuts the plan to the
    # materialized blocks, so every round starts from a flat scan.
    words = (
        _word_table(docs, text_col)
        .select("n", _initial_tokens().alias("toks"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["total"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        nxt = words.select(
            "n", _merge_expr(a, b).alias("toks")
        ).localCheckpoint(eager=True)
        # eager=True has already materialized nxt's blocks.  Rebinding
        # `words` drops the last reference to the previous round's
        # checkpointed RDD, which is what lets the ContextCleaner
        # reclaim its blocks (Dataset.unpersist does NOT release
        # localCheckpoint storage — it only consults the CacheManager;
        # see linkgraph.py for the same lifecycle note).  No K-deep
        # chain survives because each checkpoint truncated its parent
        # lineage.
        words = nxt
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    toks = list(word) + [EOW]
    while len(toks) >= 2:
        best, best_rank = None, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        toks[best : best + 2] = [toks[best] + toks[best + 1]]
    return toks


# per-task word->tokens memo bound (see bpe_encode): ~500k entries of
# short token lists is tens of MB — ample hit rate on Zipf text, never
# an OOM multiplier across concurrent tasks
_ENCODE_CACHE_MAX = 500_000


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize with a trained merge list: ``(doc_id, n_tokens,
    tokens array<string>)`` — one Arrow-batched ``mapInPandas`` pass
    (the GPT-2 rank loop per word; merges broadcast in the closure,
    lowest rank merges first)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, counts, toklists = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                # re.ASCII \s == Java regex \s (the training-side
                # F.split separator): a Unicode space (NBSP etc.) must
                # segment identically at train and encode time, or
                # tokenization diverges from the trained statistics
                raw = "" if pd.isna(text) else str(text)
                for w in _re.split(r"\s+", raw.lower(), flags=_re.ASCII):
                    if not w:
                        continue
                    if len(cache) > _ENCODE_CACHE_MAX:
                        # UNBOUNDED, the memo grows with the partition's
                        # distinct-word count (URLs/hex ids at web scale
                        # -> executor OOM, a review finding); Zipf text
                        # loses almost no hit rate to a periodic reset
                        cache.clear()
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    toks.extend(got)
                # null-safe like the relational twin (int(NaN) raised,
                # crashing the job on one NULL id — a review finding)
                ids.append(None if pd.isna(did) else int(did))
                counts.append(len(toks))
                toklists.append(toks)
            yield pd.DataFrame(
                {"doc_id": ids, "n_tokens": counts, "tokens": toklists}
            )

    return docs.select(id_col, text_col).mapInPandas(
        run, "doc_id long, n_tokens long, tokens array<string>"
    )


def _word_tokens_expr(w: F.Column) -> F.Column:
    """Character split + the end-of-word sentinel, for an arbitrary
    word column (the lambda-side twin of :func:`_initial_tokens`)."""
    chars = F.filter(F.split(w, ""), lambda c: c != "")
    return F.concat(chars, F.array(F.lit(EOW)))


def _check_relational_merges(merges: list[tuple[str, str]]) -> None:
    """Shared cap for the expression-tree twins (each merge nests one
    more fold): real vocabularies belong in :func:`bpe_encode`."""
    if len(merges) > 64:
        raise ValueError(
            f"{len(merges)} merges would nest {len(merges)} folds into "
            "one expression tree — use bpe_encode for real vocabularies"
        )


def _words_expr(text_col: str) -> F.Column:
    """Whitespace word array of a text column, NULL-safe: a NULL text
    coalesces to '' (empty word array), matching bpe_encode's
    null-as-empty rule — F.split(NULL) would propagate NULL through
    the fold and size(NULL) yields -1 (a review finding)."""
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: w != "",
    )


def bpe_encode_relational(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Relational twin of :func:`bpe_encode` for SMALL, FIXED merge
    lists: the train-side rewrite fold (:func:`_merge_expr`) applied
    in rank order as ONE JVM expression tree — zero Python, and
    therefore replayable by the DuckDB oracle (the ``bpe_pack`` gate).

    Sequential rank-order application equals the greedy
    lowest-rank-first loop of :func:`bpe_encode`: a merge's output
    token can only appear in LATER-ranked merges (the pair ``(a, b)``
    had to exist before any merge containing ``a+b`` was learned), so
    by the time rank ``k`` applies, no earlier-ranked pair can ever
    re-form — equality is pinned against :func:`bpe_encode` across the
    corpus in tests/test_bpe.py.

    Intended for gates, tests, and short demo vocabularies: each merge
    nests one more fold into the expression tree, so a 32k-merge
    production vocabulary belongs in :func:`bpe_encode` (a broadcast
    rank table), not here.  Output schema matches :func:`bpe_encode`:
    ``(doc_id, n_tokens, tokens array<string>)``.
    """
    _check_relational_merges(merges)

    def encode_word(w: F.Column) -> F.Column:
        toks = _word_tokens_expr(w)
        for a, b in merges:
            toks = _merge_expr(a, b, toks)
        return toks

    words = _words_expr(text_col)
    toks = F.flatten(F.transform(words, encode_word))
    # two projections, not one: referencing the fold tree twice
    # (size + passthrough) would evaluate it twice — higher-order
    # functions get no common-subexpression elimination, and
    # CollapseProject leaves non-cheap multi-referenced aliases alone
    enc = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        toks.alias("tokens"),
    )
    return enc.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        "tokens",
    )


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(doc_id, n_tokens)`` under a fixed merge list, via the
    DISTINCT-WORD table — the scale path for count-only consumers
    (shard assignment, packing): the rewrite fold runs once per
    VOCABULARY word (the ``bpe_train`` work shape — orders of
    magnitude fewer rows than word occurrences), token lengths join
    back to the (doc, word) occurrence rows, and a partial-agg'd
    groupBy sums per document.  Versus :func:`bpe_encode_relational`'s
    per-occurrence fold this traded one narrow shuffle for a ~20x wall
    cut at sf0.1 (measured; the interpreted HOF fold dominates
    otherwise).  A document with no words (all-whitespace text) yields
    NO row, matching a relational tokenize-then-count replay.
    """
    _check_relational_merges(merges)
    words = _words_expr(text_col)
    occ = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(words).alias("word"),
    )
    # r15 optimization (guide §4.2): the per-word rewrite used to run as
    # ``len(merges)`` nested ``F.aggregate`` folds — higher-order
    # functions are CodegenFallback, so every vocabulary word paid
    # K x O(tokens) INTERPRETED expression evals, and the K nested
    # folds alone dominated the plan's analysis/optimization time (the
    # capstone's biggest driver-side cost).  The greedy rank loop
    # (:func:`_encode_word`, the bpe_encode kernel) produces the
    # identical token sequence — sequential rank-order fold equality is
    # the documented bpe_encode_relational invariant, pinned across the
    # corpus in tests/test_bpe.py — so the distinct-word table now runs
    # ONE Arrow-batched mapInPandas pass instead.  Counts are integers;
    # no float surface.
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    def _wlen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "wlen": [
                        len(_encode_word(w, ranks)) for w in pdf["word"]
                    ],
                }
            )

    wlen = (
        occ.select("word")
        .distinct()
        .mapInPandas(_wlen, "word string, wlen long")
    )
    return (
        occ.join(wlen, "word")
        .groupBy("doc_id")
        .agg(F.sum("wlen").cast("long").alias("n_tokens"))
    )


__all__ = [
    "EOW",
    "bpe_encode",
    "bpe_encode_relational",
    "bpe_token_counts",
    "bpe_train",
]
