"""BPE merge training pinned against an independent pure-Python reference
(the Sennrich 2016 algorithm transcribed directly from the paper's
pseudocode) — on a hand corpus with known merges AND on the real sf0.001
documents table, so the distributed pair-count/argmax/fold pipeline is
value-locked end to end.  q124 is rows-only at the driver (iterative, not
SQL-expressible); this file IS its correctness contract."""

from __future__ import annotations

from collections import Counter

import pytest

from tests.conftest import SF_DIR

END = "</w>"


def _ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Pure-Python reference: greedy max-pair merging with the
    (count desc, left, right) tie-break the Spark side uses."""
    vocab = {tuple(list(w) + [END]): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((left, right, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def _ref_segment(word: str, merges) -> list[str]:
    out = list(word) + [END]
    for left, right, _ in merges:
        new = []
        for x in out:
            if new and new[-1] == left and x == right:
                new[-1] = left + right
            else:
                new.append(x)
        out = new
    return out


def test_bpe_hand_corpus(spark, tmp_path):
    """The classic low/lower/newest/widest corpus: 'es', 'est</w>' and
    'lo' emerge in frequency order."""
    from hoover_snoop2_spark.operators.bpe import learn_bpe

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(w for w, f in freqs.items() for _ in range(f))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = learn_bpe(docs, "text", n_merges=6)
    assert got == _ref_bpe(freqs, 6)
    # the famous first merges of this corpus
    assert got[0][:2] == ("e", "s")
    assert got[1][:2] == ("es", "t")


def test_bpe_greedy_overlap(spark):
    """'a a a' under merge (a,a): greedy left-to-right gives [aa, a</w>]
    shape — the merge count for round 2 must reflect NON-overlapping
    application (aaaa -> two aa, aaa -> one aa + a)."""
    from hoover_snoop2_spark.operators.bpe import learn_bpe

    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaa")], "doc_id long, text string"
    )
    got = learn_bpe(docs, "text", n_merges=2)
    ref = _ref_bpe({"aaaa": 2, "aaa": 1}, 2)
    assert got == ref
    assert got[0][:2] == ("a", "a")


def test_bpe_matches_reference_on_real_corpus(spark):
    from hoover_snoop2_spark.operators.bpe import learn_bpe, word_frequencies

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    freqs = {
        r["word"]: r["freq"] for r in word_frequencies(docs).collect()
    }
    got = learn_bpe(docs, "text", n_merges=8)
    assert got == _ref_bpe(freqs, 8)
    assert len(got) == 8


def test_bpe_early_stop(spark):
    """All-unique symbols: no pair reaches count 2, zero merges."""
    from hoover_snoop2_spark.operators.bpe import learn_bpe

    docs = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    assert learn_bpe(docs, "text", n_merges=4) == []


def test_segment_words_replays_merges(spark):
    from hoover_snoop2_spark.operators.bpe import learn_bpe, segment_words

    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    text = " ".join(w for w, f in freqs.items() for _ in range(f))
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = learn_bpe(docs, "text", n_merges=6)
    words = spark.createDataFrame(
        [("lowest",), ("newer",)], "word string"
    )
    got = {
        r["word"]: r["pieces"]
        for r in segment_words(words, merges).collect()
    }
    for w in ("lowest", "newer"):
        assert got[w] == _ref_segment(w, merges)


def test_q124_driver_entry(spark):
    import __spark_entry__ as e

    df = e.queries()["q124_bpe_merges"](spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 8
    assert [r["merge_rank"] for r in rows] == list(range(1, 9))
    assert all(r["merged"] == r["left"] + r["right"] for r in rows)
    # counts are non-increasing is NOT guaranteed by BPE (later merges can
    # beat earlier residuals), but every count must be >= 2
    assert all(r["pair_count"] >= 2 for r in rows)


def test_bpe_checkpoint_store_route(spark, tmp_path):
    """cluster-safe pin path: CheckpointStore parquet rounds match the
    localCheckpoint default."""
    from hoover_snoop2_spark.operators.bpe import learn_bpe

    docs = spark.createDataFrame(
        [(0, "low low lower newest newest newest widest")],
        "doc_id long, text string",
    )
    a = learn_bpe(docs, "text", n_merges=4)
    b = learn_bpe(docs, "text", n_merges=4, checkpoint_dir=str(tmp_path))
    assert a == b and a
