"""Windowed-vs-ExactSubstr gap measurement for ``substring_strip``
(VERDICT r8 ask #4).

``substring_strip`` flags stride-aligned fixed windows; Lee et al.
2022's ExactSubstr removes every maximal duplicated substring ≥ 50
chars found by a suffix array. The windowed approximation misses (a)
duplicated runs shorter than ~1.5×window and (b) run TAILS that don't
cover a full aligned window. This probe measures the per-character gap
on a planted corpus:

1. Corpus: random-alphabet docs with duplicated snippets planted at
   RANDOM (stride-misaligned) offsets across docs — lengths straddling
   the 50-char ExactSubstr floor (30/45 below it, 50–300 above).
2. Reference: a suffix-array pass over the separator-joined corpus
   (exactly the Lee et al. construction): sort all suffixes, mark
   ``[i, i+lcp)`` for every adjacent pair with LCP ≥ 50. The union of
   marks is the ground-truth duplicated character set.
3. Engine: ``substring_strip`` at several (window, stride) settings.
   A pure-python mirror of the flag rule recovers the removed char
   positions; the mirror is VALIDATED against the engine run — its
   per-doc removed-char total must equal the engine's
   ``n_chars_removed`` for every doc, so the positions measured are
   the engine's, not a simulation's.
4. Report: per-setting recall over reference-duplicated chars, plus
   over-strip (chars removed that the reference does not mark — the
   windowed rule flags any ≥2-occurrence window, including short
   repeats ExactSubstr's 50-char floor ignores).
5. ``substring_strip_exact`` (r9, the sorted-suffix-equivalent
   variant added BECAUSE of this probe's recall numbers) runs last —
   its mirror is the position-exploded min_len-gram rule; expected
   recall 100.0 / over-strip 0.0 against the suffix-array reference.

Usage: python tools/substr_gap_probe.py [n_docs] [seed]
Prints one JSON line; paste the table into COVERAGE.md / the docstring.
"""

from __future__ import annotations

import hashlib
import json
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MIN_LEN = 50  # ExactSubstr's duplicated-substring floor (Lee et al.)
SETTINGS = [(40, 20), (50, 25), (30, 15), (25, 10), (20, 10), (40, 40)]


def build_corpus(n_docs: int, seed: int) -> dict[int, str]:
    rng = random.Random(seed)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789 "
    docs = {
        i: "".join(rng.choice(alpha) for _ in range(rng.randint(400, 800)))
        for i in range(n_docs)
    }
    # planted duplicated snippets at random (misaligned) offsets
    snip_lens = [30, 45, 50, 55, 60, 70, 80, 100, 120, 160, 200, 300]
    for ln in snip_lens:
        for rep in range(3):  # 3 independent snippets per length
            snippet = "".join(rng.choice(alpha) for _ in range(ln))
            for _ in range(rng.randint(2, 4)):  # copies across docs
                d = rng.randrange(n_docs)
                off = rng.randrange(len(docs[d]))
                docs[d] = docs[d][:off] + snippet + docs[d][off:]
    return docs


def reference_dup_chars(docs: dict[int, str]) -> dict[int, set[int]]:
    """Suffix-array adjacent-LCP marking — the Lee et al. ExactSubstr
    ground truth: every char inside a ≥ MIN_LEN substring that occurs
    ≥ 2 times in the corpus."""
    parts, owner = [], []  # owner[j] = (doc_id, char offset) or None
    for d in sorted(docs):
        for k, ch in enumerate(docs[d]):
            parts.append(ch)
            owner.append((d, k))
        parts.append("\x00")  # separator: never inside a ≥50 match
        owner.append(None)
    s = "".join(parts)
    n = len(s)
    # 64-char keys suffice to ORDER suffixes for ≥50-char LCP detection;
    # true LCP computed directly per adjacent pair
    sa = sorted(range(n), key=lambda i: s[i : i + 512])
    marked: dict[int, set[int]] = {d: set() for d in docs}
    for a, b in zip(sa, sa[1:]):
        l = 0
        m = min(n - a, n - b)
        while l < m and s[a + l] == s[b + l] and s[a + l] != "\x00":
            l += 1
        if l >= MIN_LEN:
            for start in (a, b):
                for j in range(start, start + l):
                    o = owner[j]
                    if o is not None:
                        marked[o[0]].add(o[1])
    return marked


def windowed_removed_chars(
    docs: dict[int, str], window: int, stride: int
) -> dict[int, set[int]]:
    """Pure-python mirror of substring_strip's flag rule: stride-aligned
    windows whose md5 occurs ≥ 2 times corpus-wide, merged to spans."""
    occ: dict[str, int] = {}
    wins: dict[int, list[int]] = {}
    for d, t in docs.items():
        if len(t) < window:
            wins[d] = []
            continue
        n_win = (len(t) - window) // stride + 1
        starts = [i * stride for i in range(n_win)]
        wins[d] = starts
        for st in starts:
            fp = hashlib.md5(t[st : st + window].encode()).hexdigest()
            occ[fp] = occ.get(fp, 0) + 1
    removed: dict[int, set[int]] = {d: set() for d in docs}
    for d, t in docs.items():
        for st in wins[d]:
            fp = hashlib.md5(t[st : st + window].encode()).hexdigest()
            if occ[fp] >= 2:
                removed[d].update(range(st, st + window))
    return removed


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    docs = build_corpus(n_docs, seed)
    ref = reference_dup_chars(docs)
    n_ref = sum(len(v) for v in ref.values())

    from pyspark.sql import SparkSession

    from aces_spark.datapipe.dedup import substring_strip

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("substr-gap-probe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )

    out = {"n_docs": n_docs, "ref_dup_chars": n_ref, "settings": {}}
    for window, stride in SETTINGS:
        eng = {
            r["doc_id"]: r["n_chars_removed"]
            for r in substring_strip(df, window=window, stride=stride).collect()
        }
        mirror = windowed_removed_chars(docs, window, stride)
        mism = [
            d for d in docs if len(mirror[d]) != eng.get(d, 0)
        ]
        if mism:
            raise AssertionError(
                f"mirror != engine for w={window},s={stride}: docs {mism[:5]}"
            )
        hit = sum(len(mirror[d] & ref[d]) for d in docs)
        over = sum(len(mirror[d] - ref[d]) for d in docs)
        n_rm = sum(len(mirror[d]) for d in docs)
        out["settings"][f"w{window}_s{stride}"] = {
            "recall_pct": round(100.0 * hit / max(1, n_ref), 1),
            "removed_chars": n_rm,
            "overstrip_pct": round(100.0 * over / max(1, n_rm), 1),
        }
        print(f"w={window} s={stride}: {out['settings'][f'w{window}_s{stride}']}",
              file=sys.stderr)

    # the exact (position-exploded gram) variant
    from aces_spark.datapipe.dedup import substring_strip_exact

    eng = {
        r["doc_id"]: r["n_chars_removed"]
        for r in substring_strip_exact(df, min_len=MIN_LEN).collect()
    }
    mirror: dict[int, set[int]] = {d: set() for d in docs}
    gram_occ: dict[str, int] = {}
    for d, t in docs.items():
        for i in range(len(t) - MIN_LEN + 1):
            g = t[i : i + MIN_LEN]
            gram_occ[g] = gram_occ.get(g, 0) + 1
    for d, t in docs.items():
        for i in range(len(t) - MIN_LEN + 1):
            if gram_occ[t[i : i + MIN_LEN]] >= 2:
                mirror[d].update(range(i, i + MIN_LEN))
    mism = [d for d in docs if len(mirror[d]) != eng.get(d, 0)]
    if mism:
        raise AssertionError(f"exact mirror != engine: docs {mism[:5]}")
    hit = sum(len(mirror[d] & ref[d]) for d in docs)
    over = sum(len(mirror[d] - ref[d]) for d in docs)
    n_rm = sum(len(mirror[d]) for d in docs)
    out["settings"]["exact_L50"] = {
        "recall_pct": round(100.0 * hit / max(1, n_ref), 1),
        "removed_chars": n_rm,
        "overstrip_pct": round(100.0 * over / max(1, n_rm), 1),
    }
    print(f"exact L=50: {out['settings']['exact_L50']}", file=sys.stderr)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
