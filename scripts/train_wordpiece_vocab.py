#!/usr/bin/env python
"""Train and commit the engine's WordPiece vocab (sparkdoc/data/) from the
deterministic synthetic corpora — no network, no model downloads; rerun
deliberately if the corpus generators change, then regenerate the chunk-
derived golden fixtures (scripts/regen_goldens.py) since chunk budgets are
tokenizer-true."""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    from sparkdoc.golden import extract_corpus_golden
    from sparkdoc.synth import invoice_corpus, synth_corpus
    from sparkdoc.wordpiece import save_vocab, train_wordpiece

    texts: list[str] = []
    for nodes in (synth_corpus(96, 42), invoice_corpus(24, 42)):
        for doc_spans in extract_corpus_golden(nodes).values():
            texts.extend(s["text"] for s in doc_spans if s["text"])
    print(f"training on {len(texts)} span texts")
    vocab = train_wordpiece(texts, vocab_size=2048)
    data_dir = os.path.join(ROOT, "sparkdoc", "data")
    os.makedirs(data_dir, exist_ok=True)
    path = os.path.join(data_dir, "wordpiece_vocab_v1.txt.gz")
    h = save_vocab(vocab, path)
    print(f"wrote {path}: {len(vocab)} pieces, blake2b8={h}")


if __name__ == "__main__":
    main()
