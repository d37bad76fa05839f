"""Direct tests for the vendored WordPiece tokenizer (sparkdoc/wordpiece.py).

The chunk-fixture pins exercise it end-to-end; these pin the tokenizer's own
contract — greedy longest-match-first, [UNK]-as-one-token, reconstruction,
deterministic training — so a vocab or algorithm change fails HERE with a
readable diff instead of as an opaque fixture hash mismatch.

Reference analog: HybridChunker budgets on a real HF tokenizer
(core/extractors/document_chunker.py:50-154); the greedy longest-match rule
is standard WordPiece inference.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkdoc.wordpiece import (
    TOKEN_RE,
    WordPiece,
    default_tokenizer,
    train_wordpiece,
    vocab_hash,
)

COMMITTED_VOCAB_HASH = "963f92e20fa3c3a2"  # FIXTURES.md pin


def rejoin(pieces: list[str]) -> str:
    return pieces[0] + "".join(p[2:] for p in pieces[1:])


class TestGreedyMatch:
    def test_longest_match_first(self):
        tok = WordPiece(["a", "ab", "abc", "##b", "##c"])
        assert tok.pieces("abc") == ["abc"]
        assert tok.pieces("abb") == ["ab", "##b"]
        assert tok.pieces("ab") == ["ab"]
        assert tok.pieces("acb") == ["a", "##c", "##b"]

    def test_unmatchable_word_is_unk(self):
        tok = WordPiece(["a", "##b"])
        assert tok.pieces("az") is None  # 'z' has no continuation piece
        assert tok.count_word("az") == 1  # [UNK] counts as ONE token
        assert tok.pieces("ba") is None  # 'b' has no word-initial piece

    def test_count_is_memoized_consistently(self):
        tok = WordPiece(["a", "ab", "##b", "##c"])
        assert tok.pieces("abc") == ["ab", "##c"]  # greedy longest-first
        first = tok.count_word("abc")
        assert first == 2
        assert tok.count_word("abc") == first  # memoized hit agrees

    def test_count_text_splits_like_the_chunker(self):
        tok = default_tokenizer()
        text = "Hello, world! x y"
        words = TOKEN_RE.findall(text.lower())
        assert tok.count(text) == sum(tok.count_word(w) for w in words)


class TestDefaultVocab:
    def test_committed_hash(self):
        assert default_tokenizer().hash == COMMITTED_VOCAB_HASH

    def test_printable_ascii_never_unk(self):
        tok = default_tokenizer()
        # the trainer floors the vocab with full printable ASCII, so any
        # printable-ASCII word tokenizes without [UNK]
        for w in ("zzzzqqq", "x1y2z3", "@@##!!"):
            for piece_word in TOKEN_RE.findall(w):
                assert tok.pieces(piece_word) is not None, piece_word

    def test_reconstruction_on_sample(self):
        tok = default_tokenizer()
        for w in ("contract", "extraction", "pipeline", "a1b2", "hello"):
            p = tok.pieces(w)
            assert p is not None and rejoin(p) == w


class TestTraining:
    CORPUS = ["the cat sat on the mat", "the cat ran", "a mat on a cat"] * 3

    def test_deterministic(self):
        v1 = train_wordpiece(self.CORPUS, vocab_size=128)
        v2 = train_wordpiece(list(self.CORPUS), vocab_size=128)
        assert v1 == v2 and vocab_hash(v1) == vocab_hash(v2)

    def test_training_words_never_unk(self):
        vocab = train_wordpiece(self.CORPUS, vocab_size=128)
        tok = WordPiece(vocab)
        for text in self.CORPUS:
            for w in TOKEN_RE.findall(text):
                p = tok.pieces(w)
                assert p is not None and rejoin(p) == w

    def test_frequent_word_merges_to_one_piece(self):
        vocab = train_wordpiece(self.CORPUS, vocab_size=256, min_pair_freq=2)
        tok = WordPiece(vocab)
        assert tok.pieces("cat") == ["cat"]  # top-frequency word fully merged


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=24))
@settings(max_examples=200, deadline=None)
def test_property_default_vocab_reconstructs_printable_ascii(word):
    tok = default_tokenizer()
    for w in TOKEN_RE.findall(word.lower()):
        p = tok.pieces(w)
        assert p is not None, w
        assert rejoin(p) == w
        assert tok.count_word(w) == len(p)
        assert tok.count_word(w) >= 1


@given(
    st.lists(
        st.text(alphabet="abcdef", min_size=1, max_size=8), min_size=1, max_size=30
    )
)
@settings(max_examples=100, deadline=None)
def test_property_trained_vocab_covers_its_corpus(words):
    corpus = [" ".join(words)]
    tok = WordPiece(train_wordpiece(corpus, vocab_size=512))
    for w in words:
        p = tok.pieces(w)
        assert p is not None and rejoin(p) == w


# --- token-id emission ---------------------------------------------------------


def test_encode_ids_match_pieces_and_counts():
    tok = default_tokenizer()
    inv = {i: p for p, i in tok.ids.items()}
    text = "The quick brown fox jumps; cost $12.50!"
    ids = tok.encode(text)
    # id sequence decodes back to the piece sequence of each word in order
    pieces = []
    for w in TOKEN_RE.findall(text.lower()):
        pieces.extend(tok.pieces(w))
    assert [inv[i] for i in ids] == pieces
    assert len(ids) == tok.count(text)


def test_encode_unk_and_empty():
    tok = default_tokenizer()
    # CJK is outside the trained+ASCII alphabet → the word is ONE UNK id
    # (accented latin like 'naïve' IS covered — the vocab trained on the
    # engine's mojibake corpora)
    ids = tok.encode("日本語")
    assert ids == [WordPiece.UNK_ID]
    assert tok.encode("") == []
    assert tok.count("日本語") == 1  # count/encode stay consistent


def test_ids_are_file_order_stable():
    tok = default_tokenizer()
    # ids enumerate the committed vocab in file order: spot-pin bijectivity
    assert sorted(tok.ids.values()) == list(range(len(tok.ids)))
    assert all(tok.ids[p] >= 0 for p in tok.vocab)


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=0, max_size=60))
@settings(max_examples=150, deadline=None)
def test_property_encode_length_equals_count(text):
    tok = default_tokenizer()
    assert len(tok.encode(text)) == tok.count(text)
