"""Train the checked-in byte-level-BPE merge fixture.

Classic BPE training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; the GPT-2 tokenizer
applies the same merge table byte-level): start from characters,
repeatedly merge the most frequent adjacent symbol pair over the
word-frequency table, record each merge in order. Trained on the
sf0.001 ``documents`` corpus (deterministic: ties break
lexicographically), 1000 merges, written in the public merges.txt
layout (``#version`` header, one ``a b`` pair per line, rank =
line order).

Usage: python tools/train_bpe.py [sf_dir] [n_merges] [out_path]
"""

from __future__ import annotations

import collections
import re
import sys

_WORD_RE = re.compile(r"[a-z0-9]+")


def word_freqs(texts) -> dict[str, int]:
    freqs: collections.Counter[str] = collections.Counter()
    for t in texts:
        freqs.update(_WORD_RE.findall((t or "").lower()))
    return dict(freqs)


def train(freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    words: dict[tuple[str, ...], int] = {
        tuple(w): n for w, n in freqs.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: collections.Counter[tuple[str, str]] = collections.Counter()
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += n
        if not pairs:
            break
        # deterministic: max count, ties → lexicographically smallest
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        merged = a + b
        new_words: dict[tuple[str, ...], int] = {}
        for syms, n in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + n
        words = new_words
    return merges


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else "aligned_spark/resources/bpe_merges_1k.txt"
    )
    import duckdb

    con = duckdb.connect()
    texts = [
        r[0]
        for r in con.execute(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    merges = train(word_freqs(texts), n_merges)
    with open(out, "w", encoding="utf-8") as fh:
        fh.write("#version: 0.2\n")
        for a, b in merges:
            fh.write(f"{a} {b}\n")
    print(f"wrote {len(merges)} merges to {out}")


if __name__ == "__main__":
    main()
