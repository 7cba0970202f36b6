"""Shared pure-Python BPE reference (Sennrich, Haddow & Birch, ACL
2016): the single spec implementation every BPE test pins against —
greedy left-to-right non-overlapping merge, (count DESC, pair ASC)
tie-break.  One copy only (mid-round r14 review: three near-identical
inline copies could silently pin different semantics after a tie-break
fix)."""

import collections


def ref_bpe(word_counts: dict, n_merges: int):
    """Run ``n_merges`` BPE training rounds over a word histogram.

    Returns ``(merges, vocab)``: the merge table rows
    (step, lhs, rhs, merged, n) and the final per-word symbolization
    {word: [symbols]}.
    """
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, n_merges + 1):
        pc = collections.Counter()
        for w, c in word_counts.items():
            sy = vocab[w]
            for i in range(len(sy) - 1):
                pc[(sy[i], sy[i + 1])] += c
        if not pc:
            break
        (l, r), n = min(
            pc.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        merges.append((step, l, r, l + r, n))
        for w, sy in vocab.items():
            out = []
            for s in sy:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab
