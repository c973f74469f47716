"""Distributed BPE merge learning and tokenization (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").

The training-data pipeline's missing tokenizer half: the engine already
COUNTS tokens (``functions/text.bpe_token_count``, a fixed regex); this
module LEARNS the merge table from the corpus and applies it — what a
100 TB pretraining run does once per tokenizer revision.

Scale shape (the whole point):

- ``word_frequencies`` is the ONLY corpus-scale pass — one explode +
  hash-agg, map-side partial combine, so the shuffle carries
  vocabulary-sized counts (Heaps' law: ~10^7 types for 10^11 tokens),
  never the corpus.
- Every merge round then runs over the VOCAB relation alone: one
  pair-count aggregation (again vocab-sized, weighted by word freq) and
  one Arrow-batch merge pass.  The driver receives exactly ONE row per
  round (the argmax pair) — the same bounded-driver loop discipline as
  ``operators/cc.dedup_clusters`` and ``operators/ivf.kmeans_train``.
- ``localCheckpoint`` every few rounds truncates the iterative lineage
  (without it round k replans k stacked mapInPandas stages).

Determinism: ties on pair count break lexicographically (smallest pair
wins), so the merge sequence is a pure function of the corpus — re-runs
and the pure-Python differential reference produce the identical table.
End-of-word is marked with the paper's ``</w>`` sentinel appended as a
distinct symbol, so "low" the word and "low" the prefix of "lower"
learn different merges, exactly as in the reference algorithm.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """Whitespace word-frequency table ``(word string, freq long)`` —
    the one corpus-scale aggregation; everything downstream is
    vocab-sized."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_pair_in_seq(seq: list[str], a: str, b: str) -> list[str]:
    """One left-to-right merge pass: every non-overlapping adjacent
    (a, b) becomes a+b (the reference algorithm's replacement rule)."""
    out: list[str] = []
    i, n = 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def bpe_learn(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    checkpoint_every: int = 4,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge table ``[(left, right), ...]`` (rank = list index).

    Each round: count adjacent symbol pairs over the vocab (weighted by
    word freq, one vocab-sized hash-agg), take the global argmax with
    (count desc, pair asc) tie-break — ``orderBy().limit(1)`` compiles
    to TakeOrderedAndProject, a per-partition top-1 heap, not a global
    sort — then rewrite the vocab's symbol sequences in one Arrow pass.
    Stops early when no pair is left (fully merged corpus).
    """
    spark = df.sparkSession
    vocab = word_frequencies(df, text_col).select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(EOW))
        ).alias("syms"),
        "freq",
    )

    merges: list[tuple[str, str]] = []
    for r in range(num_merges):
        pairs = (
            vocab.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(
                            a.alias("left"), b.alias("right")
                        ),
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = (
            pairs.orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["left"], top[0]["right"]
        merges.append((a, b))

        def gen(batches: Iterator[pd.DataFrame], a=a, b=b):
            for pdf in batches:
                pdf["syms"] = [
                    _merge_pair_in_seq(list(s), a, b) for s in pdf["syms"]
                ]
                yield pdf

        vocab = vocab.mapInPandas(gen, schema="syms array<string>, freq long")
        if (r + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return merges


def _encode_word(
    word: str, merges: list[tuple[str, str]], cache: dict[str, list[str]]
) -> list[str]:
    """Greedy rank-order merge loop for one word, memoized per batch —
    the reference algorithm's inner loop shared by apply and fertility."""
    hit = cache.get(word)
    if hit is None:
        seq = list(word) + [EOW]
        for a, b in merges:
            if len(seq) < 2:
                break
            seq = _merge_pair_in_seq(seq, a, b)
        cache[word] = hit = seq
    return hit


def bpe_apply(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenize the corpus with a learned merge table: ``(id_col,
    n_tokens int, tokens array<string>)``.

    One Arrow pass over the corpus; the merge table rides in the UDF
    closure (broadcast with the serialized function — it's the
    tokenizer artifact, kilobytes to a few MB). Per word, merges apply
    in rank order, the reference algorithm's greedy loop; a per-batch
    word cache collapses repeated words (Zipf: the hot words dominate),
    so the merge loop runs per TYPE per batch, not per token.
    """
    id_type = df.schema[id_col].dataType.simpleString()

    def encode_word(word: str, cache: dict[str, list[str]]) -> list[str]:
        return _encode_word(word, merges, cache)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            ids, counts, toks = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                seq: list[str] = []
                for w in (text or "").split():
                    seq.extend(encode_word(w, cache))
                ids.append(i)
                counts.append(len(seq))
                toks.append(seq)
            yield pd.DataFrame(
                {id_col: ids, "n_tokens": counts, "tokens": toks}
            )

    narrow = df.select(id_col, text_col)
    return narrow.mapInPandas(
        gen, schema=f"{id_col} {id_type}, n_tokens int, tokens array<string>"
    )


def bpe_fertility(
    df: DataFrame,
    text_col: str,
    group_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Tokenizer fertility report per group (typically language): how
    many BPE tokens the merge table spends per word and how many
    characters each token carries — THE acceptance metric for a
    tokenizer revision (a vocab that tokenizes one language at 2x the
    fertility of another silently halves that language's effective
    context window and doubles its training cost).

    Returns one row per group: (group_col, n_docs, n_words, n_tokens,
    fertility = tokens/word, chars_per_token). One narrow Arrow pass
    over (group, text) computing per-doc word/char/token counts with the
    same per-batch word cache as ``bpe_apply`` (the merge loop runs per
    TYPE, not per token), then a single group-keyed hash-agg with
    map-side partial combine — no join back to the corpus, and the token
    arrays themselves are never materialized.
    """
    grp_type = df.schema[group_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cache: dict[str, list[str]] = {}
            grps, words, chars, toks = [], [], [], []
            for g, text in zip(pdf[group_col], pdf[text_col]):
                t = text or ""
                n_w = n_t = 0
                for w in t.split():
                    n_w += 1
                    n_t += len(_encode_word(w, merges, cache))
                grps.append(g)
                words.append(n_w)
                chars.append(len(t))
                toks.append(n_t)
            yield pd.DataFrame(
                {
                    group_col: grps,
                    "_words": words,
                    "_chars": chars,
                    "_toks": toks,
                }
            )

    per_doc = df.select(group_col, text_col).mapInPandas(
        gen,
        schema=f"{group_col} {grp_type}, _words long, _chars long, _toks long",
    )
    return per_doc.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("_words").alias("n_words"),
        F.sum("_toks").alias("n_tokens"),
        (
            F.sum("_toks").cast("double") / F.sum("_words").cast("double")
        ).alias("fertility"),
        (
            F.sum("_chars").cast("double") / F.sum("_toks").cast("double")
        ).alias("chars_per_token"),
    )
