#!/usr/bin/env python3
"""Independent exact ground truth for the five O(n²)-oracle near-dup
queries at the sf1 decade (VERDICT r10 next #4).

The DuckDB oracles for q43/q45/q112/q114/q137 are brute-force
all-pairs scans over per-doc shingle LISTS — hour-scale at sf1 (and
prefix filtering inside DuckDB barely prunes: the synthetic corpus has
a ~2k-shingle vocabulary, so per-doc "rare" prefixes still carry
df in the hundreds). This checker recomputes the SAME exact answers
with a different algorithm and different engine:

  * char-5-gram set intersections for ALL pairs via BLOCKED integer
    matrix multiplication (docs × vocab 0/1 matrix; A·Aᵀ gives every
    |A∩B| exactly — float32 accumulation is exact for counts < 2²⁴,
    and the widest doc has ~500 shingles). 50k × 50k pairs in minutes.
  * jaccard = inter / (|A|+|B|−inter) in float64 — the identical
    IEEE division of exact integers that Spark and DuckDB perform.
  * q137's word-5-gram grain via an inverted index (word 5-grams are
    nearly unique, so posting lists — and Σdf² — track true near-dup
    volume).
  * q45's components via sequential union-find over the exact pair
    set; q112/q114 dispositions by replaying their delta/base CASE
    logic in pandas.

Usage: tools/sf1_neardup_check.py <sfDir> <verifyDir>
Compares against the Spark parquet written by graft.Verify and exits
non-zero on any mismatch. Independent of the repo's Scala code and of
its DuckDB oracle SQL — a third implementation, which is the point.
"""
import sys
import numpy as np
import duckdb

SF, VDIR = sys.argv[1], sys.argv[2]
THRESH_NUM, THRESH_DEN = 4, 5  # t = 0.8, compared in exact rational form

con = duckdb.connect()


def table(name):
    # driver testdata is single files; GenScale output is directories
    for pat in (f"{SF}/{name}.parquet", f"{SF}/{name}.parquet/*.parquet"):
        try:
            return con.execute(
                f"SELECT * FROM read_parquet('{pat}')").fetch_arrow_table()
        except Exception:
            continue
    raise IOError(f"cannot read {name} under {SF}")


def spark_out(qname):
    return con.execute(
        f"SELECT * FROM read_parquet('{VDIR}/{qname}/*.parquet')").df()


docs = table("documents").to_pydict()
doc_ids = docs["doc_id"]
texts = docs["text"]
sources = docs["source"]
n_docs = len(doc_ids)
print(f"[neardup] {n_docs} docs at {SF}")

# ---- exact char-5-gram pair set by blocked matmul ----
def char_grams(t):
    # mirrors generate_series(1, greatest(len-4, 1)) + substr(_, i, 5)
    return {t[i:i + 5] for i in range(max(len(t) - 4, 1))}

gram_sets = [char_grams(t) for t in texts]
vocab = {}
for s in gram_sets:
    for g in s:
        if g not in vocab:
            vocab[g] = len(vocab)
V = len(vocab)
print(f"[neardup] char-5-gram vocab {V}")
A = np.zeros((n_docs, V), dtype=np.float32)
for r, s in enumerate(gram_sets):
    for g in s:
        A[r, vocab[g]] = 1.0
sizes = A.sum(axis=1).astype(np.int64)

pairs = {}  # (doc_a, doc_b) id-ordered -> (inter, jaccard)
BLK = 2048
ids = np.asarray(doc_ids, dtype=np.int64)
for lo in range(0, n_docs, BLK):
    hi = min(lo + BLK, n_docs)
    inter = A[lo:hi] @ A.T  # exact small-int counts in float32
    inter_i = np.rint(inter).astype(np.int64)
    union = sizes[lo:hi, None] + sizes[None, :] - inter_i
    # exact rational threshold: inter/union >= 4/5  <=>  5*inter >= 4*union
    cand = np.argwhere(THRESH_DEN * inter_i >= THRESH_NUM * union)
    for r, c in cand:
        gi, gj = lo + int(r), int(c)
        if gi == gj:
            continue
        a, b = ids[gi], ids[gj]
        if a > b:
            a, b = b, a
        iv = int(inter_i[r, c])
        uv = int(union[r, c])
        pairs[(int(a), int(b))] = (iv, iv / uv)
print(f"[neardup] exact jaccard>=0.8 char-gram pairs: {len(pairs)}")

fails = []


def check(name, ok, detail=""):
    print(f"[neardup] {'OK  ' if ok else 'FAIL'} {name} {detail}")
    if not ok:
        fails.append(name)


# ---- q43: the pair list itself ----
q43 = spark_out("q43_dedup_ngram_jaccard")
got43 = {(int(r.doc_a), int(r.doc_b)): float(r.jaccard)
         for r in q43.itertuples()}
want43 = {k: j for k, (_, j) in pairs.items()}
check("q43_dedup_ngram_jaccard",
      got43 == want43,
      f"(spark {len(got43)} pairs, ground truth {len(want43)})")

# ---- q45: components over the pair set -> per-source rollup ----
parent = {}
def find(x):
    while parent.get(x, x) != x:
        parent[x] = parent.get(parent[x], parent[x])
        x = parent[x]
    return x
def union(a, b):
    ra, rb = find(a), find(b)
    if ra != rb:
        if ra > rb:
            ra, rb = rb, ra
        parent[rb] = ra  # smaller root wins -> component min labels
for (a, b) in pairs:
    union(a, b)
from collections import defaultdict
roll = defaultdict(lambda: [0, 0, 0])  # source -> [input, kept, dropped]
for i in range(n_docs):
    d = int(ids[i])
    comp = find(d)
    roll[sources[i]][0] += 1
    roll[sources[i]][1 if d == comp else 2] += 1
q45 = spark_out("q45_dedup_resolve")
got45 = {r.source: (int(r.n_input), int(r.n_kept), int(r.n_dropped))
         for r in q45.itertuples()}
want45 = {s: tuple(v) for s, v in roll.items()}
check("q45_dedup_resolve", got45 == want45,
      f"(sources {len(got45)})")

# ---- q112: delta disposition (delta = doc_id % 5 == 0) ----
base_d = defaultdict(int)
delta_d = defaultdict(int)
for (a, b) in pairs:
    for d, p in ((a, b), (b, a)):
        if d % 5 == 0:
            if p % 5 != 0:
                base_d[d] += 1
            else:
                delta_d[d] += 1
want112 = {}
for i in range(n_docs):
    d = int(ids[i])
    if d % 5 != 0:
        continue
    nb, nd = base_d.get(d, 0), delta_d.get(d, 0)
    verdict = "dup_of_base" if nb > 0 else ("dup_within_delta" if nd > 0 else "new")
    want112[d] = (verdict, nb, nd)
q112 = spark_out("q112_incremental_dedup")
got112 = {int(r.doc_id): (r.verdict, int(r.n_base_dups), int(r.n_delta_dups))
          for r in q112.itertuples()}
check("q112_incremental_dedup", got112 == want112,
      f"(delta docs {len(got112)})")

# ---- q114: delta-vs-base stream flags ----
want114 = {}
for (a, b) in pairs:
    for sd, bd in ((a, b), (b, a)):
        if sd % 5 == 0 and bd % 5 != 0:
            if sd not in want114:
                want114[sd] = [0, (1704067200 + (sd // 60) * 3600) * 1000000]
            want114[sd][0] += 1
q114 = spark_out("q114_stream_neardup")
got114 = {int(r.doc_id): [int(r.n_base_dups), int(r.win_start_us)]
          for r in q114.itertuples()}
check("q114_stream_neardup", got114 == want114,
      f"(flagged docs {len(got114)})")

# ---- q137: word-5-gram prefix join ground truth via inverted index ----
word_sets = []
w_ids = []
for i in range(n_docs):
    w = texts[i].split(" ")
    if len(w) < 5:
        continue
    s = {" ".join(w[j:j + 5]) for j in range(len(w) - 4)}
    word_sets.append(s)
    w_ids.append(int(ids[i]))
posting = defaultdict(list)
for k, s in enumerate(word_sets):
    for g in s:
        posting[g].append(k)
cand = set()
for lst in posting.values():
    if len(lst) > 1:
        for x in range(len(lst)):
            for y in range(x + 1, len(lst)):
                cand.add((lst[x], lst[y]))
want137 = {}
for (x, y) in cand:
    sa, sb = word_sets[x], word_sets[y]
    inter = len(sa & sb)
    un = len(sa) + len(sb) - inter
    if THRESH_DEN * inter >= THRESH_NUM * un:
        a, b = w_ids[x], w_ids[y]
        if a > b:
            a, b = b, a
        want137[(a, b)] = (inter, inter / un)
q137 = spark_out("q137_prefix_jaccard")
got137 = {(int(r.doc_a), int(r.doc_b)): (int(r.n_common), float(r.jaccard))
          for r in q137.itertuples()}
check("q137_prefix_jaccard", got137 == want137,
      f"(spark {len(got137)} pairs, ground truth {len(want137)})")

if fails:
    print(f"[neardup] FAILED: {fails}")
    sys.exit(1)
print("[neardup] all five O(n^2)-oracle queries exact at this SF")
