"""Learned-BPE tokenizer: trainer semantics on a known corpus,
determinism, and the distributed apply path."""

import pytest

from kenshin_spark.bpe import (
    EOW,
    encode_word,
    fit,
    tokenize,
    train_bpe_merges,
    vocab_of,
    word_frequencies,
)


class TestTrainer:
    def test_known_corpus_learns_expected_first_merge(self):
        # classic Sennrich example shape: 'low' family dominates
        wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = train_bpe_merges(wf, 3)
        # 'es' appears in newest+widest = 9 weighted — wait: 'e','s'
        # freq = 6+3 = 9; 'l','o' = 5+2 = 7; 's','t' = 9; 't',EOW = 9.
        # 9-way tie breaks lexicographically: ('e','s') < ('s','t') <
        # ('t', '</w>')
        assert merges[0] == ("e", "s")
        assert merges[1] == ("es", "t")  # now 'est' freq 9
        assert merges[2] == ("est", EOW)

    def test_tie_break_is_deterministic(self):
        wf = [("ab", 3), ("cd", 3)]
        assert train_bpe_merges(wf, 1)[0] == ("a", "b")

    def test_stops_when_no_pair_repeats(self):
        wf = [("a", 1)]  # single symbol + EOW, pair freq 1 < 2
        assert train_bpe_merges(wf, 10) == []

    def test_encode_follows_merge_ranks(self):
        merges = [("e", "s"), ("es", "t"), ("est", EOW), ("l", "o"),
                  ("lo", "w")]
        ranks = {p: i for i, p in enumerate(merges)}
        assert encode_word("lowest", ranks) == ["low", "est" + EOW]
        # unseen word falls back to chars (+ any applicable merges)
        assert encode_word("te", ranks) == ["t", "e", EOW]


class TestDistributed:
    @pytest.fixture()
    def docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "low low low low low lower lower"),
                (2, "newest newest newest newest newest newest"),
                (3, "widest widest widest"),
            ],
            "doc_id long, text string",
        )

    def test_word_frequencies(self, docs):
        wf = {r["word"]: r["freq"]
              for r in word_frequencies(docs).collect()}
        assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}

    def test_fit_matches_local_trainer(self, docs):
        wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        assert fit(docs, n_merges=5) == train_bpe_merges(wf, 5)

    def test_tokenize_roundtrip_properties(self, docs):
        merges = fit(docs, n_merges=8)
        out = {r["doc_id"]: r for r in tokenize(docs, merges).collect()}
        # every doc tokenized, token count positive and consistent
        assert set(out) == {1, 2, 3}
        for r in out.values():
            assert r["n_tokens"] == len(r["tokens"]) > 0
        # detokenization recovers the original words: strip EOW, join,
        # compare against the normalized text
        toks = out[1]["tokens"]
        text = "".join(toks).replace(EOW, " ").strip()
        assert text == "low low low low low lower lower"

    def test_null_text_yields_null_row(self, spark):
        docs = spark.createDataFrame(
            [(1, "ok ok"), (2, None)], "doc_id long, text string"
        )
        merges = fit(docs.where("text IS NOT NULL"), 4)
        out = {r["doc_id"]: r for r in tokenize(docs, merges).collect()}
        assert out[2]["tokens"] is None and out[2]["n_tokens"] is None
        assert out[1]["n_tokens"] > 0

    def test_vocab_and_corpus_compression(self, spark):
        """On the synthetic documents corpus: more merges never increase
        the token count, and the learned vocab is deterministic across
        two fits (layout independence)."""
        from kenshin_spark.io import load_table

        docs = load_table(
            spark, "/root/testdata/sf0.001", "documents"
        ).limit(100)
        m1 = fit(docs, n_merges=50)
        m2 = fit(docs.repartition(7), n_merges=50)
        assert m1 == m2  # layout-independent training
        assert len(vocab_of(m1)) == len(m1)

        few = tokenize(docs, m1[:10]).agg({"n_tokens": "sum"}).first()[0]
        many = tokenize(docs, m1).agg({"n_tokens": "sum"}).first()[0]
        assert many <= few
