"""Minimal WordPiece tokenizer: greedy longest-match-first over a committed
vocab — the chunker's token budget is tokenizer-TRUE like the reference's
(HybridChunker budgets on a HF wordpiece/tiktoken tokenizer,
core/extractors/document_chunker.py:50-154, ``chunk_max_tokens=512``), not a
regex word count.

Pure Python, no network, no model downloads: the vocab is TRAINED here
(``train_wordpiece`` — the published WordPiece/BPE merge algorithm scored by
pair-likelihood, as in the open tokenizers literature) over the engine's own
deterministic corpora and committed to ``sparkdoc/data/`` with its hash
recorded. Counting runs inside the chunker's mapInPandas hot loop, so the
tokenizer memoizes per-word piece counts (corpus words repeat massively) and
pre-splits with the same word/punct regex the previous counter used.

[UNK] semantics: a word that cannot be fully matched from the vocab counts
as ONE unknown token (standard WordPiece behavior); the committed vocab
contains every character seen in training plus full printable ASCII, so this
is rare on engine corpora.
"""

from __future__ import annotations

import gzip
import hashlib
import os
import re
from typing import Iterable

TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

DEFAULT_VOCAB = "wordpiece_vocab_v1.txt.gz"
_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


# --------------------------------------------------------------------------
# trainer (offline; deterministic)
# --------------------------------------------------------------------------


def _word_counts(texts: Iterable[str]) -> dict[str, int]:
    counts: dict[str, int] = {}
    for t in texts:
        for w in TOKEN_RE.findall((t or "").lower()):
            counts[w] = counts.get(w, 0) + 1
    return counts


def train_wordpiece(texts: Iterable[str], vocab_size: int = 4096, min_pair_freq: int = 2) -> list[str]:
    """WordPiece vocab from raw texts: start from the character alphabet
    (continuations prefixed ``##``), repeatedly merge the pair with the best
    likelihood score freq(ab) / (freq(a)·freq(b)) until ``vocab_size`` —
    deterministic (score, then lexicographic tie-break)."""
    counts = _word_counts(texts)
    # each word as its piece sequence: first char, then ##char...
    splits: dict[str, list[str]] = {
        w: [w[0]] + [f"##{c}" for c in w[1:]] for w in counts if w
    }
    vocab: dict[str, int] = {}
    for w, n in counts.items():
        for p in splits[w]:
            vocab[p] = vocab.get(p, 0) + n
    # full printable ASCII floor so no engine text ever hits [UNK]
    import string

    for c in string.printable:
        if not c.isspace():
            vocab.setdefault(c, 0)
            vocab.setdefault(f"##{c}", 0)
    # NOTE: the merge loop below rescans every word's full piece sequence per
    # iteration (O(vocab_size x corpus pieces)). Deliberate: this trainer runs
    # ONCE offline to produce the committed vocab (hash pinned in FIXTURES.md)
    # — an incremental pair-count update would be faster but risks changing
    # tie-break order and silently drifting the pinned vocab.
    while len(vocab) < vocab_size:
        pair_freq: dict[tuple[str, str], int] = {}
        piece_freq: dict[str, int] = {}
        for w, n in counts.items():
            parts = splits[w]
            for p in parts:
                piece_freq[p] = piece_freq.get(p, 0) + n
            for a, b in zip(parts, parts[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + n
        best = None
        best_score = 0.0
        for (a, b), f in pair_freq.items():
            if f < min_pair_freq:
                continue
            score = f / (piece_freq[a] * piece_freq[b])
            if best is None or score > best_score or (score == best_score and (a, b) < best):
                best, best_score = (a, b), score
        if best is None:
            break
        a, b = best
        merged = a + b[2:] if b.startswith("##") else a + b
        vocab[merged] = pair_freq[best]
        for w in splits:
            parts = splits[w]
            out: list[str] = []
            i = 0
            while i < len(parts):
                if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            splits[w] = out
    return sorted(vocab)


def save_vocab(vocab: list[str], path: str) -> str:
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(vocab))
    return vocab_hash(vocab)


def vocab_hash(vocab: list[str]) -> str:
    return hashlib.blake2b("\n".join(vocab).encode("utf-8"), digest_size=8).hexdigest()


# --------------------------------------------------------------------------
# runtime tokenizer
# --------------------------------------------------------------------------


class WordPiece:
    """Greedy longest-match-first WordPiece with per-word piece-count
    memoization (the chunker only needs COUNTS; piece strings are exposed for
    tests/debugging)."""

    #: id of a word no vocab path covers (standard [UNK]); the committed
    #: vocab occupies ids 0..len-1 in FILE ORDER, so ids are stable under
    #: the same vocab hash and never collide with UNK
    UNK_ID = -1

    def __init__(self, vocab: Iterable[str]):
        ordered = list(dict.fromkeys(vocab))  # file order, first occurrence wins
        self.vocab = frozenset(ordered)
        self.ids = {p: i for i, p in enumerate(ordered)}
        self.max_piece = max((len(v) for v in self.vocab), default=1)
        self._count_cache: dict[str, int] = {}
        self._id_cache: dict[str, list[int]] = {}
        self.hash = vocab_hash(sorted(self.vocab))

    def pieces(self, word: str) -> list[str] | None:
        """Piece sequence for one (lowercased) word; None = [UNK]."""
        out: list[str] = []
        i = 0
        n = len(word)
        while i < n:
            end = min(n, i + self.max_piece)
            piece = None
            while end > i:
                cand = word[i:end] if i == 0 else "##" + word[i:end]
                if cand in self.vocab:
                    piece = cand
                    break
                end -= 1
            if piece is None:
                return None
            out.append(piece)
            i = end
        return out

    def count_word(self, word: str) -> int:
        c = self._count_cache.get(word)
        if c is None:
            p = self.pieces(word)
            c = 1 if p is None else len(p)
            if len(self._count_cache) < 1_000_000:  # bounded per-executor memo
                self._count_cache[word] = c
            else:
                return c
        return c

    def word_ids(self, word: str) -> list[int]:
        """Token ids for one (lowercased) word; an uncoverable word is ONE
        ``UNK_ID`` — so ``len(word_ids(w)) == count_word(w)`` always."""
        ids = self._id_cache.get(word)
        if ids is None:
            p = self.pieces(word)
            ids = [self.UNK_ID] if p is None else [self.ids[x] for x in p]
            if len(self._id_cache) < 1_000_000:  # bounded per-executor memo
                self._id_cache[word] = ids
        return ids

    def encode(self, text: str) -> list[int]:
        """Token ids for a text (the chunker's word/punct pre-split, each
        word greedy-matched). Training-shard emission path — id order is the
        committed vocab's FILE order, pinned by the vocab hash."""
        cache = self._id_cache
        out: list[int] = []
        for w in TOKEN_RE.findall((text or "").lower()):
            ids = cache.get(w)
            if ids is None:
                ids = self.word_ids(w)
            out.extend(ids)
        return out

    def count(self, text: str) -> int:
        # hot path of the chunker: inline the memo-hit branch (a genexpr +
        # method call per word measurably dominates the chunk kernel; the
        # cache hits on nearly every word of natural text)
        cache = self._count_cache
        total = 0
        for w in TOKEN_RE.findall((text or "").lower()):
            c = cache.get(w)
            if c is None:
                c = self.count_word(w)
            total += c
        return total


_DEFAULT: WordPiece | None = None


def default_tokenizer() -> WordPiece:
    """The vendored-vocab tokenizer, loaded once per process (executors each
    pay one gzip read; the data file ships inside the package)."""
    global _DEFAULT
    if _DEFAULT is None:
        path = os.path.join(_DATA_DIR, DEFAULT_VOCAB)
        with gzip.open(path, "rt", encoding="utf-8") as f:
            _DEFAULT = WordPiece(f.read().splitlines())
    return _DEFAULT
