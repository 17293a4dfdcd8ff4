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
