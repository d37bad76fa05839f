"""Trained byte-pair encoding (BPE) over the corpus — the trained-tokenizer
slot of a training-data pipeline (complements the committed-vocab WordPiece
in sparkdoc/wordpiece.py, which COUNTS tokens against a fixed vocab; this
module LEARNS the vocab from the corpus itself).

Algorithm (Sennrich et al. 2016, re-derived for a distributed engine):

  fit:    represent each distinct word as space-joined symbols
          ('h e l l o </w>'), then n_merges times: count adjacent symbol
          pairs weighted by word frequency, pick the most frequent pair
          (count desc, pair asc — deterministic, engine-portable), and fuse
          it everywhere.
  encode: apply the learned merges to a word's symbol string in rank order.

Distributed shape
-----------------
Everything runs on the DISTINCT-WORDS frame, which is vocabulary-sized
(bounded by language, not corpus size — at 100 TB it is still ~10^7 rows
after the one map-side-combined groupBy over the corpus). Each fit
iteration is one small aggregation plus one driver-side argmax collect of a
single row — n_merges tiny actions over a cached vocab-sized frame, never a
corpus scan. Encoding is a chain of pure-JVM `replace` expressions on the
words frame (no UDF), broadcast-joined back to the corpus for per-document
token counts.

Merge-application semantics (pinned, engine-portable)
-----------------------------------------------------
A merge (a, b) rewrites ' a b ' -> ' ab ' on the space-padded symbol string
with plain left-to-right non-overlapping `replace`, repeated FIX_PASSES
times. One pass is NOT enough: in ' a b a b ' the first match consumes the
shared space, hiding the second occurrence — but each pass at least halves
the surviving occurrences, so FIX_PASSES = 7 reaches the fixpoint for any
word up to 2^7 symbols (far beyond real words; fit asserts the bound). The
fixpoint is exactly "no ' a b ' remains", the same invariant the reference
algorithm's simultaneous regex achieves, and — critically — it is
expressible verbatim in any SQL dialect, which is what lets the DuckDB
oracle replay both fit and encode bit-for-bit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FIX_PASSES = 7
END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct lowercase letters-only words with corpus frequencies —
    the ONLY corpus-wide stage (one map-side-combined shuffle)."""
    return (
        docs.select(F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def init_symbols(word: F.Column) -> F.Column:
    """word -> space-joined character symbols + end-of-word marker:
    'hello' -> 'h e l l o </w>'. The regexp is dialect-common (the oracle
    uses the identical rewrite)."""
    return F.concat(F.regexp_replace(word, "(.)", "$1 "), F.lit(END))


def _apply_merge(col: F.Column, a: str, b: str) -> F.Column:
    """Fuse one merge on a space-PADDED symbol string, FIX_PASSES times."""
    pat = F.lit(f" {a} {b} ")
    rep = F.lit(f" {a}{b} ")
    for _ in range(FIX_PASSES):
        col = F.replace(col, pat, rep)
    return col


def fit_bpe(
    words: DataFrame, n_merges: int = 8, max_words: int | None = None
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a (word, cnt) frame.

    Driver loop with one single-row collect per merge over the cached
    vocabulary-sized frame — documented and intentional (the argmax of each
    iteration feeds the next iteration's plan as a literal; there is no
    data-parallel formulation of sequential greedy selection). Ties break
    (count desc, a asc, b asc).

    SAMPLING CONTRACT for real vocab sizes: greedy BPE is inherently one
    tiny Spark job per merge, so a 30k-merge fit must not iterate over the
    full distinct-word frame of a 100 TB corpus. ``max_words`` caps the
    fit to the TOP-``max_words`` words by corpus frequency (ties broken on
    the word — deterministic): the head of a Zipf-ish vocabulary carries
    almost all token mass, so pair statistics over it are the statistics
    that matter, and the learned merges still ENCODE every word (encoding
    never consults the fit corpus, only the merge table). Default None
    fits on everything — the oracle-gated exact semantics."""
    if max_words is not None:
        words = words.orderBy(F.desc("cnt"), F.asc("word")).limit(int(max_words))
    state = words.select(
        (F.concat(F.lit(" "), init_symbols(F.col("word")), F.lit(" "))).alias("syms"),
        "cnt",
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            arr = F.split(F.trim(F.col("syms")), " ")
            pairs = (
                state.select(arr.alias("s"), "cnt")
                .filter(F.size("s") >= 2)
                .select(
                    F.explode(
                        F.expr(
                            "transform(slice(s, 1, size(s) - 1),"
                            " (x, i) -> struct(x AS a, element_at(s, i + 2) AS b))"
                        )
                    ).alias("p"),
                    "cnt",
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("cnt").alias("n"))
                .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not pairs:
                break
            a, b = pairs[0]["a"], pairs[0]["b"]
            merges.append((a, b))
            nxt = state.select(_apply_merge(F.col("syms"), a, b).alias("syms"), "cnt")
            nxt = nxt.localCheckpoint(eager=True)
            state.unpersist()
            state = nxt
    finally:
        state.unpersist()
    return merges


#: above this merge count the expr chain is no longer the right plan: the
#: chain is len(merges)*FIX_PASSES nested replace nodes — fine at gate size
#: (8 merges = 56 nodes), but a real 30k-merge vocab would hand Catalyst an
#: expression tree of ~2*10^5 nodes and analysis/codegen chokes long before
#: data does. The pandas encoder (merge-rank maximal munch, Arrow-batched,
#: per-word memoized) is O(len(word) * merges_applied) per DISTINCT word and
#: is pinned bit-equal to the chain at small vocab.
EXPR_MERGE_LIMIT = 64


def encode_words(
    words: DataFrame, merges: list[tuple[str, str]], impl: str = "auto"
) -> DataFrame:
    """Apply learned merges to every distinct word. Output: (word, cnt?,
    tokens array<string>, n_tokens).

    ``impl='expr'``: a pure-JVM chain of ``len(merges) * FIX_PASSES``
    replace expressions, zero UDFs, zero shuffles — the fastest plan at
    small vocab and the oracle-replayable one (the DuckDB twin runs the
    identical chain). ``impl='pandas'``: one Arrow-batched stage driven by
    the merge-rank table — the scale path for real vocab sizes, where the
    expr chain's expression-tree size would choke Catalyst.
    ``impl='auto'`` picks expr at <= EXPR_MERGE_LIMIT merges, pandas above.
    The two are bit-equal (parity-pinned): sequentially fusing merges in
    rank order equals iteratively fusing the lowest-rank adjacent pair,
    because a merge's symbols always predate it in the learned order, so
    applying merge k can never create an occurrence of a merge < k."""
    if impl == "auto":
        impl = "expr" if len(merges) <= EXPR_MERGE_LIMIT else "pandas"
    if impl == "pandas":
        return _encode_words_pandas(words, merges)
    if impl != "expr":
        raise ValueError(f"encode_words: unknown impl {impl!r}")
    col = F.concat(F.lit(" "), init_symbols(F.col("word")), F.lit(" "))
    for a, b in merges:
        col = _apply_merge(col, a, b)
    out = words.withColumn("_syms", F.trim(col))
    return out.withColumn("tokens", F.split(F.col("_syms"), " ")).withColumn(
        "n_tokens", F.size("tokens")
    ).drop("_syms")


def _fuse_fixpoint(syms: list[str], a: str, b: str) -> list[str]:
    """List twin of the pinned ``' a b ' -> ' ab '`` replace-to-fixpoint:
    within one pass a match CONSUMES its trailing space, so the symbol right
    after a fuse can never open a match in the same pass (str.replace
    resumes scanning after the replaced text) — ``a a a a a`` fuses to
    ``[aa, a, aa]``, NOT ``[aa, aa, a]``. Passes repeat until unchanged,
    exactly like FIX_PASSES reaching the no-``' a b '``-remains fixpoint."""
    while True:
        out: list[str] = []
        i = 0
        changed = False
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                changed = True
                if i + 2 < len(syms):  # skip-one: its leading space is gone
                    out.append(syms[i + 2])
                i += 3
            else:
                out.append(syms[i])
                i += 1
        if not changed:
            return syms
        syms = out


def encode_word_ranked(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Min-rank iterative BPE encode of one word (the pandas kernel; plain
    Python so tests drive it directly). Each round finds the lowest-rank
    adjacent pair present and fuses it to fixpoint with the EXACT pinned
    replace semantics (_fuse_fixpoint); rounds repeat until no learned pair
    remains. Bit-equal to applying the merges sequentially in rank order:
    fusing merge k can only create pairs involving its new symbol, and any
    merge containing that symbol was learned later, so no occurrence of a
    merge < k ever (re)appears."""
    syms = list(word) + [END]
    while len(syms) >= 2:
        best_rank = None
        best_pair = None
        for x, y in zip(syms, syms[1:]):
            r = ranks.get((x, y))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (x, y)
        if best_pair is None:
            break
        syms = _fuse_fixpoint(syms, best_pair[0], best_pair[1])
    return syms


def _encode_words_pandas(
    words: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """Arrow-batched encoder: the merge-rank dict ships once per executor
    via the UDF closure (a 30k-merge table is ~1 MB — broadcast-class);
    per-word results memoized within each worker. Zero shuffles."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf(ArrayType(StringType()))
    def _enc(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = encode_word_ranked(w, ranks)
            return got

        return s.map(enc)

    return words.withColumn("tokens", _enc(F.col("word"))).withColumn(
        "n_tokens", F.size("tokens")
    )


def bpe_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Per-document BPE token count: the corpus explodes once to words, the
    encoded vocabulary (tiny) broadcast-joins on, and a map-side-combined
    sum rolls up. Words outside the letters-only tokenizer contribute 0."""
    words = (
        docs.select("doc_id", F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("word"))
        .filter(F.length("word") > 0)
    )
    vocab = encode_words(
        words.select("word").distinct(), merges
    ).select("word", "n_tokens")
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy("doc_id")
        .agg(F.sum("n_tokens").alias("bpe_tokens"), F.count("*").alias("bpe_words"))
    )


# --------------------------------------------------------------------------
# Pure-Python twin (tests + oracle-construction aid)
# --------------------------------------------------------------------------

def fit_bpe_py(word_cnt: dict[str, int], n_merges: int = 8) -> list[tuple[str, str]]:
    """Reference twin of fit_bpe: identical semantics, plain dicts."""
    state = {f" {' '.join(w)} {END} ": c for w, c in _fold(word_cnt).items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for s, c in state.items():
            syms = s.split()
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        nxt: dict[str, int] = {}
        for s, c in state.items():
            s2 = apply_merge_py(s, a, b)
            nxt[s2] = nxt.get(s2, 0) + c
        state = nxt
    return merges


def _fold(word_cnt: dict[str, int]) -> dict[str, int]:
    out: dict[str, int] = {}
    for w, c in word_cnt.items():
        out[w] = out.get(w, 0) + c
    return out


def apply_merge_py(padded: str, a: str, b: str) -> str:
    """Replace-to-fixpoint twin; asserts FIX_PASSES is a true upper bound."""
    pat, rep = f" {a} {b} ", f" {a}{b} "
    for i in range(FIX_PASSES + 1):
        nxt = padded.replace(pat, rep)
        if nxt == padded:
            assert i <= FIX_PASSES, "FIX_PASSES bound violated"
            return padded
        padded = nxt
    raise AssertionError(f"merge ({a},{b}) did not reach fixpoint in {FIX_PASSES} passes")


def encode_word_py(word: str, merges: list[tuple[str, str]]) -> list[str]:
    s = f" {' '.join(word)} {END} "
    for a, b in merges:
        s = apply_merge_py(s, a, b)
    return s.split()
