"""Byte-pair-encoding merge training (Sennrich, Haddow & Birch, ACL 2016)
as a distributed vocabulary job — the tokenizer-prep step every LLM
training pipeline runs between cleaned text and token ids.

Shape matters more than the loop count: the ONLY corpus-sized pass is the
word-frequency groupBy; every merge round after that operates on the
VOCABULARY table (words are unique, frequencies carry the corpus weight),
which is millions of rows at web scale — comfortably distributed but
never corpus-sized.  Each round is:

1. pair counting — ``zip_with`` the symbol array against its own tail
   (adjacent pairs), explode, groupBy (left, right) with a freq-weighted
   sum — one vocab-sized shuffle, all JVM;
2. argmax — ``orderBy(count desc, left, right).limit(1)`` to the driver
   (one row, like PageRank's dangling-mass scalar — deterministic
   tie-break so reruns and engines agree);
3. merge application — a sequential ``aggregate`` HOF fold over each
   symbol array implementing the greedy left-to-right merge (the fold
   order IS the BPE spec: "a a a" under merge (a,a) becomes [aa, a],
   not [a, aa]) — a codegen'd Project, no shuffle.

Per-round lineage truncation follows the graph.py convention (an
iterative DataFrame loop otherwise stacks 4 plan copies per round):
``checkpoint_dir`` routes through CheckpointStore for the cluster-safe
parquet route, default localCheckpoint for single-node runs.

Reference parity: the reference has no tokenizer training (it indexes
into Elasticsearch, snoop/data/indexing.py); this is part of the
LLM-data-pipeline surface the brief adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: marks the word boundary so merges cannot cross words and the learned
#: units distinguish suffixes ("est</w>") from infixes ("est") — the
#: original Sennrich formulation.
END_OF_WORD = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-split text — the one corpus pass."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts, frequency-weighted, over the vocab."""
    syms = F.col("syms")
    n = F.size(syms)
    pairs = F.zip_with(
        F.slice(syms, 1, n - 1),
        F.slice(syms, 2, n - 1),
        lambda a, b: F.struct(a.alias("left"), b.alias("right")),
    )
    return (
        vocab.select(F.explode(pairs).alias("p"), "freq")
        .groupBy("p.left", "p.right")
        .agg(F.sum("freq").alias("pair_count"))
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Greedy left-to-right merge of (left, right) -> left+right in every
    symbol array — a sequential fold, so overlapping candidates resolve
    exactly as the reference implementation's linear scan does."""
    merged = F.lit(left + right)
    new_syms = F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return vocab.select(new_syms.alias("syms"), "freq")


def learn_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    checkpoint_dir: str | None = None,
) -> list[tuple[str, str, int]]:
    """Learn the first ``n_merges`` BPE merges over a text column.

    Returns [(left, right, pair_count), ...] in merge order.  Stops
    early when no pair occurs twice (nothing left worth merging).
    """
    _cp = None
    if checkpoint_dir is not None:
        from ..plans.checkpoint import CheckpointStore

        _cp = CheckpointStore(checkpoint_dir)

    def _pin(df: DataFrame, name: str) -> DataFrame:
        if _cp is not None:
            return _cp.write(df, name)
        return df.localCheckpoint(eager=True)

    words = word_frequencies(docs, text_col)
    vocab = words.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_OF_WORD))
        ).alias("syms"),
        "freq",
    )
    vocab = _pin(vocab, "bpe_round_init")

    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        best = (
            _pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["pair_count"] < 2:
            break
        left, right, cnt = (
            best[0]["left"],
            best[0]["right"],
            int(best[0]["pair_count"]),
        )
        merges.append((left, right, cnt))
        vocab = _pin(
            _apply_merge(vocab, left, right), f"bpe_round_{it}"
        )
    return merges


def segment_words(
    words: DataFrame,
    merges: list[tuple[str, str, int]],
    word_col: str = "word",
) -> DataFrame:
    """Apply a learned merge list to segment words into BPE units —
    adds a ``pieces: array<string>`` column.  Merges replay in learned
    order (the BPE inference rule); each replay is one fold Project,
    so ``n_merges`` chained Projects and zero shuffles."""
    def _fold(left: str, right: str):
        merged = F.lit(left + right)

        def step(acc, x):
            return F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
            ).otherwise(F.concat(acc, F.array(x)))

        return step

    out = words.select(
        F.col(word_col),
        F.concat(
            F.split(F.col(word_col), ""), F.array(F.lit(END_OF_WORD))
        ).alias("pieces"),
    )
    for left, right, _ in merges:
        out = out.select(
            word_col,
            F.aggregate(
                F.col("pieces"),
                F.array().cast("array<string>"),
                _fold(left, right),
            ).alias("pieces"),
        )
    return out
