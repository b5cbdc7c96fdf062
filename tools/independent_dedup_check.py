#!/usr/bin/env python3
"""INDEPENDENT verification of the dedup_* golden-constant oracles.

The dedup_minhash / dedup_ngram_jaccard / dedup_simhash oracles in
SparkEntry.oracleSql are golden constants generated from the query's own
verified dump (tools/gen_oracles.py) — they pin determinism and partition
invariance but are circular against a shared semantic bug (VERDICT r2,
"What's missing #2"). This script closes that loop: it recomputes the same
quantities at sf0.01 in pure Python from the PUBLISHED algorithm specs —
no Spark, no JVM, no shared code — and compares against the pinned
constants.

What it computes, per query:
  dedup_minhash       exact all-pairs 5-shingle jaccard >= 0.8 over the
                      500 sf0.01 documents (ground truth, O(n^2)), PLUS a
                      from-spec replication of the banded-LSH candidate
                      pipeline — both must equal the pinned (25, 0.9709).
                      all-pairs == LSH also proves 100% recall at this SF.
  dedup_ngram_jaccard from-spec replication of minhashLshPairs(k=3,
                      bands=8, rows=2) + exact jaccard summed over ALL
                      candidates -> pinned (29, 24.3769).
  dedup_simhash       exact all-pairs hamming <= 3 over term-frequency
                      simhash signatures (banding is recall-lossless by
                      pigeonhole, so all-pairs IS the LSH answer) ->
                      pinned (17, 1.7059). Zero-token docs excluded
                      (engine filters sig==0 before banding).

Hash parity: Spark's xxhash64 (XXH64, seed 42) is reimplemented from the
xxHash specification below and self-checked at startup against six
reference values dumped from Spark. Exit code 0 = all PASS.

Usage: independent_dedup_check.py [sfDir]   (default /root/testdata/sf0.01)
"""
import sys
import itertools

# ---------------------------------------------------------------- xxh64 ----
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def _round(acc, inp):
    acc = (acc + inp * P2) & M
    return (_rotl(acc, 31) * P1) & M


def _fmix(h):
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int = 42) -> int:
    """xxHash64 over bytes; returns SIGNED 64-bit (Spark long semantics)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1, v2, v3, v4 = (seed + P1 + P2) & M, (seed + P2) & M, seed & M, (seed - P1) & M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], 'little')); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i + 8], 'little')); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i + 8], 'little')); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i + 8], 'little')); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i:i + 8], 'little'))
        h = ((_rotl(h ^ k, 27)) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i:i + 4], 'little') * P1) & M), 23)) * P2 + P3) & M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_long(v: int, seed: int = 42) -> int:
    """Spark xxhash64 of a LONG column = xxh64 of its 8 little-endian bytes."""
    return xxh64((v & M).to_bytes(8, 'little'), seed)


def _self_check():
    # reference values dumped from Spark 4.1.2: xxhash64(lit(x)) (seed 42)
    assert xxh64(b"hello") == -4367754540140381902
    assert xxh64(b"") == -7444071767201028348
    assert xxh64(b"ab c") == 3634879957340616801
    assert xxh64_long(123) == -3178482946328430151
    assert xxh64_long(-5) == -5259934538394028452
    assert xxh64_long(0) == -5252525462095825812
    # murmur3_128().hashString(...).asLong() / Fingerprint64Expr.fingerprint
    # reference values dumped from the JVM
    assert murmur3_128_aslong(b"hello") == -3758069500696749310
    assert murmur3_128_aslong(b"") == 0
    assert murmur3_128_aslong(
        b"the quick brown fox jumps over the lazy dog") == -4835482818955082061
    assert fingerprint64("Hello World") == 489787648512003106
    assert fingerprint64(" ".join(
        f"tok{i} word{i % 7}" for i in range(1, 31))) == -3802809361477636212


# ------------------------------------------------------------ algorithms ----
def tokens(text):
    # Dedup.shingles / SimhashSigExpr tokenization: \S+ over lower(text)
    return text.lower().split()


def shingle_hashes(text, k):
    """Distinct k-shingle hashes (ShingleHashesExpr semantics)."""
    toks = tokens(text)
    if len(toks) >= k:
        sh = {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
    else:
        sh = {" ".join(toks)}
    return {xxh64(s.encode('utf-8')) for s in sh}


def minhash_sig(sh_hashes, num_hashes):
    """MinhashSigsExpr: sig_i = min over shingle hashes h of
    xxh64_long(h XOR seed_i), seed_i = 0x9E3779B97F4A7C15 * (i+1)."""
    GOLDEN = 0x9E3779B97F4A7C15
    sig = []
    for i in range(num_hashes):
        seed = (GOLDEN * (i + 1)) & M
        sig.append(min(xxh64_long(h ^ seed) for h in sh_hashes))
    return sig


def lsh_pairs(sigs_by_id, bands, rows_per_band):
    """minhashLshPairs: band value = xxh64 of the band's sig slice cast to
    decimal strings joined by ','; pairs = within-(band,bucket), a<b."""
    pairs = set()
    for b in range(bands):
        buckets = {}
        for i, sig in sigs_by_id.items():
            key = xxh64(",".join(str(v) for v in sig[b * rows_per_band:(b + 1) * rows_per_band])
                        .encode('utf-8'))
            buckets.setdefault(key, []).append(i)
        for ids in buckets.values():
            for a, c in itertools.combinations(sorted(ids), 2):
                pairs.add((a, c))
    return pairs


def jaccard(sa, sb):
    u = len(sa | sb)
    return len(sa & sb) / u if u else 0.0


def simhash(text):
    """SimhashSigExpr: term-frequency bit votes over xxh64(token); bit set
    when the vote sum is strictly positive."""
    votes = [0] * 64
    toks = tokens(text)
    if not toks:
        return 0
    from collections import Counter
    for t, c in Counter(toks).items():
        h = xxh64(t.encode('utf-8')) & M
        for b in range(64):
            votes[b] += c if (h >> b) & 1 else -c
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    return sig


# ------------------------------------------------------------------ main ----
def main():
    _self_check()
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb
    import os
    p = f"{sf}/documents.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    rows = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{pat}') ORDER BY doc_id").fetchall()
    print(f"docs: {len(rows)}")
    failures = 0

    def check(name, got, want):
        nonlocal failures
        ok = got == want
        if not ok:
            failures += 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: got {got} want {want}")

    # ---- dedup_minhash: pinned (pairs=25, avg_jaccard=0.9709) at tau=0.8
    sh5 = {i: shingle_hashes(t, 5) for i, t in rows}
    ids = sorted(sh5)
    true_pairs = {}
    for a, b in itertools.combinations(ids, 2):
        j = jaccard(sh5[a], sh5[b])
        if j >= 0.8:
            true_pairs[(a, b)] = j
    avg = round(sum(true_pairs.values()) / len(true_pairs), 4) if true_pairs else 0.0
    check("dedup_minhash ALL-PAIRS ground truth", (len(true_pairs), avg), (25, 0.9709))

    sigs32 = {i: minhash_sig(sh5[i], 32) for i in ids}
    cands = lsh_pairs(sigs32, bands=8, rows_per_band=4)
    lsh_hits = {p: jaccard(sh5[p[0]], sh5[p[1]]) for p in cands}
    lsh_pass = {p: j for p, j in lsh_hits.items() if j >= 0.8}
    avg_l = round(sum(lsh_pass.values()) / len(lsh_pass), 4) if lsh_pass else 0.0
    check("dedup_minhash LSH-pipeline replication", (len(lsh_pass), avg_l), (25, 0.9709))
    check("dedup_minhash recall (LSH == all-pairs)",
          sorted(lsh_pass) == sorted(true_pairs), True)

    # ---- dedup_ngram_jaccard: pinned (pairs=29, sum_jaccard=24.3769)
    sh3 = {i: shingle_hashes(t, 3) for i, t in rows}
    sigs16 = {i: minhash_sig(sh3[i], 16) for i in ids}
    cands3 = lsh_pairs(sigs16, bands=8, rows_per_band=2)
    s = round(sum(jaccard(sh3[a], sh3[b]) for a, b in cands3), 4)
    check("dedup_ngram_jaccard replication", (len(cands3), s), (29, 24.3769))

    # ---- dedup_simhash: pinned (pairs=17, avg_hamming=1.7059), k<=3
    sigs = {i: simhash(t) for i, t in rows}
    nz = [i for i in ids if sigs[i] != 0]  # engine drops zero-token docs
    hams = [bin(sigs[a] ^ sigs[b]).count("1")
            for a, b in itertools.combinations(nz, 2)
            if bin(sigs[a] ^ sigs[b]).count("1") <= 3]
    avg_h = round(sum(hams) / len(hams), 4) if hams else 0.0
    check("dedup_simhash ALL-PAIRS ground truth", (len(hams), avg_h), (17, 1.7059))

    # ---- ANN: exact brute-force ground truth + hyperplane-LSH replication
    check_ann(sf, check)

    # ---- text_fingerprint: pinned (distinct_fps=481, n=500)
    fps = {fingerprint64(t) for _, t in rows}
    check("text_fingerprint replication", (len(fps), len(rows)), (481, 500))

    print(f"== {failures} failures ==")
    sys.exit(1 if failures else 0)


# --------------------------------------------------- winnowing fingerprint ----
def _mm_rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M


def _mm_fmix(k):
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & M
    k ^= k >> 33
    return k


def murmur3_128_aslong(data: bytes, seed: int = 0) -> int:
    """murmur3 x64 128-bit; returns Guava's asLong() (first 8 hash bytes =
    h1) as a SIGNED 64-bit. Self-checked against JVM reference values."""
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16:i * 16 + 8], 'little')
        k2 = int.from_bytes(data[i * 16 + 8:i * 16 + 16], 'little')
        k1 = (k1 * c1) & M; k1 = _mm_rotl(k1, 31); k1 = (k1 * c2) & M; h1 ^= k1
        h1 = _mm_rotl(h1, 27); h1 = (h1 + h2) & M; h1 = (h1 * 5 + 0x52DCE729) & M
        k2 = (k2 * c2) & M; k2 = _mm_rotl(k2, 33); k2 = (k2 * c1) & M; h2 ^= k2
        h2 = _mm_rotl(h2, 31); h2 = (h2 + h1) & M; h2 = (h2 * 5 + 0x38495AB5) & M
    tail = data[nblocks * 16:]
    tl = len(tail)
    k1 = k2 = 0
    for i in range(tl - 1, 7, -1):
        k2 |= tail[i] << ((i - 8) * 8)
    if tl > 8:
        k2 = (k2 * c2) & M; k2 = _mm_rotl(k2, 33); k2 = (k2 * c1) & M; h2 ^= k2
    for i in range(min(tl, 8) - 1, -1, -1):
        k1 |= tail[i] << (i * 8)
    if tl > 0:
        k1 = (k1 * c1) & M; k1 = _mm_rotl(k1, 31); k1 = (k1 * c2) & M; h1 ^= k1
    h1 ^= n; h2 ^= n
    h1 = (h1 + h2) & M; h2 = (h2 + h1) & M
    h1 = _mm_fmix(h1); h2 = _mm_fmix(h2)
    h1 = (h1 + h2) & M
    return h1 - (1 << 64) if h1 >= (1 << 63) else h1


def _splitmix(h0):
    h = (h0 + 0x9E3779B97F4A7C15) & M
    h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & M
    h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & M
    return h ^ (h >> 31)


def fingerprint64(text: str) -> int:
    """Fingerprint64Expr: splitmix fold over the 8 smallest murmur3 hashes
    of the 5-gram token windows (ascending)."""
    toks = text.lower().split()
    k = 5
    if len(toks) >= k:
        grams = [" ".join(toks[j:j + k]) for j in range(len(toks) - k + 1)]
    else:
        grams = [" ".join(toks)]
    hashes = sorted(murmur3_128_aslong(g.encode('utf-8')) for g in grams)
    mins = hashes[:8]
    acc = 0x27D4EB2F165667C5
    for m in mins:
        acc_s = acc - (1 << 64) if acc >= (1 << 63) else acc
        acc = _splitmix((acc_s ^ m) & M)
    return acc - (1 << 64) if acc >= (1 << 63) else acc


# ----------------------------------------------------------------- ANN ----
def _spark_round4(x):
    """Spark round(col, 4): HALF_UP decimal rounding of the double."""
    from decimal import Decimal, ROUND_HALF_UP
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP))


def _cosine(a, b):
    """Replicates Similarity.cosine bit-for-bit: zip_with multiplies in
    FLOAT32, aggregate folds sequentially in float64; norms likewise."""
    import numpy as np
    prods = np.multiply(np.float32(a), np.float32(b), dtype=np.float32)
    dot = 0.0
    for v in prods:
        dot += float(v)
    na = 0.0
    for v in np.multiply(np.float32(a), np.float32(a), dtype=np.float32):
        na += float(v)
    nb = 0.0
    for v in np.multiply(np.float32(b), np.float32(b), dtype=np.float32):
        nb += float(v)
    import math
    n = math.sqrt(na) * math.sqrt(nb)
    return dot / n if n > 0 else 0.0


def _plane_component(p, i, seed):
    """Similarity.planeComponent: splitmix64 of (seed, plane, dim) -> [-1,1)."""
    x = (seed ^ (p * 0x9E3779B97F4A7C15) ^ (i * 0xBF58476D1CE4E5B9)) & M
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M
    x = x ^ (x >> 31)
    return (x >> 11) / float(1 << 52) - 1.0


def _hyperplane_sig(vec, planes, dim, seed):
    """HyperplaneSigExpr: per-plane sequential float64 dot, sign bits."""
    sig = 0
    for p in range(planes):
        acc = 0.0
        for i in range(min(len(vec), dim)):
            acc += float(vec[i]) * _plane_component(p, i, seed)
        if acc >= 0:
            sig |= 1 << p
    return sig


def check_ann(sf, check):
    """ann_brute_topk: EXACT cosine top-10 (independent ground truth).
    ann_lsh_topk: from-spec replication of the multi-probe bucketed path."""
    import os
    import duckdb
    p = f"{sf}/embeddings.parquet"
    pat = f"{p}/*.parquet" if os.path.isdir(p) else p
    vecs = dict(duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM read_parquet('{pat}') ORDER BY vec_id").fetchall())
    q = vecs[0]
    corpus = [(i, v) for i, v in vecs.items() if i != 0]
    scored = sorted(((i, _cosine(v, q)) for i, v in corpus),
                    key=lambda t: (-t[1], t[0]))
    brute = [(i, _spark_round4(c)) for i, c in scored[:10]]
    check("ann_brute_topk EXACT ground truth", brute,
          [(365, 0.37), (334, 0.3627), (387, 0.3311), (423, 0.2969),
           (73, 0.2954), (7, 0.2928), (320, 0.2879), (190, 0.2818),
           (464, 0.2766), (388, 0.2763)])
    planes, dim, seed = 10, len(q), 42
    qsig = _hyperplane_sig(q, planes, dim, seed)
    probes = {qsig} | {qsig ^ (1 << b) for b in range(planes)}
    cands = [(i, _cosine(v, q)) for i, v in corpus
             if _hyperplane_sig(v, planes, dim, seed) in probes]
    lsh = [(i, _spark_round4(c))
           for i, c in sorted(cands, key=lambda t: (-t[1], t[0]))[:10]]
    check("ann_lsh_topk pipeline replication", lsh,
          [(464, 0.2766), (131, 0.2406), (415, 0.238), (204, 0.1594),
           (429, 0.1498), (419, 0.0982), (361, 0.0582), (57, 0.0326),
           (212, -0.1097)])

    # ---- ann_ivf_topk: from-spec replication of the deterministic IVF --
    # trainIvf + ivfTopKWith in pure Python: seeds = nCells smallest
    # xxhash64(id); assignment = argmax sequential-double dot vs normalized
    # centroids; update = per-dim FIXED-POINT means (trunc(v * 2^20) summed
    # as ints — the partition-invariance trick); 4 iterations; probe the 8
    # best cells; exact cosine rank inside.
    n_cells, n_probe, iters, scale = 16, 8, 4, 1 << 20
    import math as _math

    def _normalized(v):
        out = [float(x) for x in v[:dim]] + [0.0] * max(0, dim - len(v))
        s = 0.0
        for x in out:
            s += x * x
        n = _math.sqrt(s)
        return [x / n for x in out] if n > 0 else out

    def _assign(v, cents):
        best, best_d = 0, float('-inf')
        for c, cent in enumerate(cents):
            acc = 0.0
            for i in range(min(len(v), dim)):
                acc += float(v[i]) * cent[i]
            if acc > best_d:
                best_d, best = acc, c
        return best

    seed_ids = sorted(corpus, key=lambda t: (xxh64_long(t[0]), str(t[0])))[:n_cells]
    cents = [_normalized(v) for _, v in seed_ids]
    for _ in range(iters):
        sums = [[0] * dim for _ in range(len(cents))]
        cnts = [[0] * dim for _ in range(len(cents))]
        for _, v in corpus:
            c = _assign(v, cents)
            for p2 in range(min(len(v), dim)):
                sums[c][p2] += int(float(v[p2]) * scale)  # trunc toward zero
                cnts[c][p2] += 1
        nxt = []
        for c in range(len(cents)):
            if all(x == 0 for x in cnts[c]):
                nxt.append(cents[c])
            else:
                mean = [((float(sums[c][p2]) / scale) / cnts[c][p2])
                        if cnts[c][p2] > 0 else 0.0 for p2 in range(dim)]
                nxt.append(_normalized(mean))
        cents = nxt
    qd = [float(x) for x in q]
    ranked = sorted(((c, sum(qd[i] * cents[c][i] for i in range(min(len(qd), dim))))
                     for c in range(len(cents))), key=lambda t: (-t[1], t[0]))
    probe_cells = {c for c, _ in ranked[:n_probe]}
    ivf_cands = [(i, _cosine(v, q)) for i, v in corpus
                 if _assign(v, cents) in probe_cells]
    ivf = [(i, _spark_round4(c))
           for i, c in sorted(ivf_cands, key=lambda t: (-t[1], t[0]))[:10]]
    check("ann_ivf_topk pipeline replication", ivf,
          [(365, 0.37), (334, 0.3627), (387, 0.3311), (423, 0.2969),
           (73, 0.2954), (7, 0.2928), (190, 0.2818), (464, 0.2766),
           (388, 0.2763), (483, 0.2567)])


if __name__ == "__main__":
    main()
