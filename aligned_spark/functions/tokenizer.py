"""Subword tokenization with a real vocabulary — WordPiece greedy
longest-match (the BERT tokenizer semantics; Wu et al. 2016), as an
Arrow-vectorized kernel over a broadcast vocab.

Token BUDGETING is a first-class training-data concern (sequence
packing, cost estimation, length filtering), and whitespace/regex
counts drift 10-40% from a model's real subword counts. This module
applies an actual piece vocabulary:

- a word matches greedily: the longest vocab piece prefixing the
  remaining word (continuations must carry the ``##`` prefix);
- if at any position no piece matches, the WHOLE word becomes
  ``[UNK]`` (HuggingFace WordPiece behavior, not per-char fallback).

Vocabularies are plain ``list[str]`` (load a real model's vocab.txt
at the call site via :func:`load_vocab` — pair it with
``split_mode="bert"`` so punctuation is billed; the default
``"alnum"`` splitter is for lowercase alphanumeric-only
vocabularies, see :func:`wordpiece_tokens`); the kernel receives it
via closure → Spark task broadcast. Python-loop-per-word is the honest cost — this is the
documented Arrow escape hatch, same tier as the SipHash dedup
kernels; the per-batch cost is linear in characters and there is no
shuffle (pure projection).

Reference capability: none (the aligned reference has no tokenizer);
extends the training-data surface.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_WORD_RE = r"[^a-z0-9]+"
# BERT-style basic tokenization (ASCII): words are [a-z0-9]+ runs,
# every other non-whitespace char is its OWN single-char token (real
# WordPiece emits punctuation as tokens and bills them). Whitespace
# is the EXPLICIT class [ \t\n\x0b\f\r] — Python-ASCII \s and Java
# \s both include \x0b but RE2 (the DuckDB oracle engine) \s does
# not, so \s would silently diverge on U+000B; the spelled-out class
# is used verbatim on both sides.
_BERT_RE = re.compile(r"[a-z0-9]+|[^a-z0-9 \t\n\x0b\f\r]")


def load_vocab(path: str) -> list[str]:
    """Load a WordPiece ``vocab.txt`` (one piece per line; CRLF
    tolerated). Blank lines are dropped — only set MEMBERSHIP is
    used here, piece ids are never consumed, so positions need not
    survive. Pieces are used verbatim — pair with
    ``split_mode="bert"`` for vocabularies that contain
    punctuation/special pieces."""
    with open(path, encoding="utf-8") as fh:
        return [ln.rstrip("\r\n") for ln in fh if ln.rstrip("\r\n")]


def wordpiece_word(word: str, starts: set, conts: set, unk: str,
                   max_piece: int) -> list[str]:
    """Greedy longest-match of ONE lowercase word. Pure function —
    shared by the kernel and the tests' reference replays."""
    out: list[str] = []
    pos, n = 0, len(word)
    while pos < n:
        vocab = starts if pos == 0 else conts
        end = min(n, pos + max_piece)
        piece = None
        for stop in range(end, pos, -1):
            cand = word[pos:stop]
            if cand in vocab:
                piece = cand
                break
        if piece is None:
            return [unk]
        out.append(piece if pos == 0 else "##" + piece)
        pos += len(piece)
    return out


def wordpiece_tokens(
    text: Column,
    vocab: list[str],
    unk: str = "[UNK]",
    split_mode: str = "alnum",
) -> Column:
    """Text column → array<string> of WordPiece tokens (lowercased,
    greedy longest-match per word).

    ``split_mode`` picks the pre-tokenizer:

    - ``"alnum"`` (default, SQL-oracle-mirrored): words are
      ``[a-z0-9]+`` runs; EVERYTHING else is a separator.
      RESTRICTION: cased pieces, punctuation pieces, and specials in
      a real model vocab can never match under this mode, and
      punctuation never enters the budget — counts will undercount
      versus the model being budgeted. Use it with lowercase
      alphanumeric-only vocabularies.
    - ``"bert"`` — BERT basic-tokenizer semantics on ASCII text:
      lowercase, ``[a-z0-9]+`` runs are words AND every other
      non-whitespace character is its own single-char token, each
      then WordPiece-matched (so ``.`` ``,`` … are billed exactly as
      a real uncased model bills them). Use with a real (lowercase)
      ``vocab.txt`` via :func:`load_vocab`.
    """
    starts = {p for p in vocab if not p.startswith("##")}
    conts = {p[2:] for p in vocab if p.startswith("##")}
    max_piece = max((len(p) for p in starts | conts), default=1)
    if split_mode == "alnum":
        word_re = re.compile(_WORD_RE)

        def _pretok(t: str) -> list[str]:
            return [w for w in word_re.split(t) if w]

    elif split_mode == "bert":

        def _pretok(t: str) -> list[str]:
            return _BERT_RE.findall(t)

    else:
        raise ValueError(f"unknown split_mode: {split_mode!r}")

    def _kernel(s):
        import pandas as pd

        out = []
        for t in s:
            toks: list[str] = []
            for w in _pretok((t or "").lower()):
                toks.extend(
                    wordpiece_word(w, starts, conts, unk, max_piece)
                )
            out.append(toks)
        return pd.Series(out, index=s.index, dtype=object)

    return F.pandas_udf(_kernel, ArrayType(StringType()))(text)


def wordpiece_token_count(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: list[str],
    unk: str = "[UNK]",
    split_mode: str = "alnum",
) -> DataFrame:
    """Per-document REAL token counts under a subword vocab — the
    budget signal for packing/length filtering: (id, n_tokens,
    n_unk). One projection (kernel) + one array aggregation; no
    shuffle, no driver transfer. See :func:`wordpiece_tokens` for
    ``split_mode`` (use "bert" with real model vocabularies)."""
    toks = wordpiece_tokens(F.col(text_col), vocab, unk, split_mode)
    projected = df.select(F.col(id_col), toks.alias("__toks"))
    return projected.select(
        id_col,
        F.size("__toks").alias("n_tokens"),
        F.size(
            F.filter("__toks", lambda t: t == F.lit(unk))
        ).alias("n_unk"),
    )


# =====================================================================
# Byte-level BPE (GPT-family token budgeting)
# =====================================================================


def load_merges(
    path: str, limit: int | None = None
) -> list[tuple[str, str]]:
    """Load a ``merges.txt`` (public BPE layout: optional ``#``
    header lines, one ``a b`` pair per line, RANK = line order; CRLF
    tolerated). ``limit`` takes the first N merges — a prefix of a
    BPE merge table is itself a valid smaller table, the standard
    way to shrink a tokenizer."""
    out: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as fh:
        for ln in fh:
            ln = ln.rstrip("\r\n")
            if not ln or ln.startswith("#"):
                continue
            a, _, b = ln.partition(" ")
            out.append((a, b))
            if limit is not None and len(out) >= limit:
                break
    return out


def bpe_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Apply a BPE merge table to ONE word (Sennrich et al. 2016;
    the GPT-2 ``bpe()`` loop): start from characters, repeatedly
    merge every left-to-right occurrence of the LOWEST-RANK adjacent
    pair until none matches. Pure function — shared by the kernel
    and the tests' reference replays.

    The SQL oracle replays this one occurrence at a time (leftmost
    of the lowest-rank pair); the two schedules provably agree for
    any table produced by BPE TRAINING, because a pair involving a
    merged symbol can only be learned after the merge that created
    the symbol, i.e. always carries a HIGHER rank — so merging one
    occurrence never changes which pair is best next."""
    syms: list[str] = list(word)
    while len(syms) > 1:
        best_rank: int | None = None
        best: tuple[str, str] | None = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (syms[i], syms[i + 1])
        if best is None:
            break
        a, b = best
        merged = a + b
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_tokens(
    text: Column,
    merges: list[tuple[str, str]],
    split_mode: str = "alnum",
) -> Column:
    """Text column → array<string> of BPE tokens. Same Arrow-kernel
    shape as :func:`wordpiece_tokens` (merge table rides the task
    closure; pure projection, no shuffle) with one extra lever: a
    per-batch WORD MEMO — natural text is Zipf-distributed, so the
    merge loop runs once per distinct word per batch, not once per
    occurrence. ``split_mode`` as in :func:`wordpiece_tokens`
    ("bert" bills punctuation as single-char tokens)."""
    ranks = {m: i for i, m in enumerate(merges)}
    if split_mode == "alnum":
        word_re = re.compile(_WORD_RE)

        def _pretok(t: str) -> list[str]:
            return [w for w in word_re.split(t) if w]

    elif split_mode == "bert":

        def _pretok(t: str) -> list[str]:
            return _BERT_RE.findall(t)

    else:
        raise ValueError(f"unknown split_mode: {split_mode!r}")

    def _kernel(s):
        import pandas as pd

        memo: dict[str, list[str]] = {}
        out = []
        for t in s:
            toks: list[str] = []
            for w in _pretok((t or "").lower()):
                enc = memo.get(w)
                if enc is None:
                    enc = bpe_word(w, ranks)
                    memo[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out, index=s.index, dtype=object)

    return F.pandas_udf(_kernel, ArrayType(StringType()))(text)


def bpe_token_count(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    split_mode: str = "alnum",
) -> DataFrame:
    """Per-document BPE token counts: (id, n_tokens, n_words) — the
    GPT-family budget signal next to the WordPiece one. One kernel
    projection + array sizes; no shuffle, no driver transfer."""
    toks = bpe_tokens(F.col(text_col), merges, split_mode)
    word_src = (
        F.array_remove(
            F.split(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                _WORD_RE,
            ),
            "",
        )
        if split_mode == "alnum"
        else None
    )
    projected = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        (
            F.size(word_src)
            if word_src is not None
            else F.lit(None).cast("int")
        ).alias("n_words"),
    )
    return projected.select(
        id_col,
        F.size("__toks").alias("n_tokens"),
        "n_words",
    )
