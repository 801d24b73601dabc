import numpy as np

from knn_for_homology_tpu.ops.align import (
    AA_INDEX,
    BLOSUM62,
    GAP_EXT,
    GAP_OPEN,
    align_pairs,
    e_values,
    encode_sequence,
    sw_scores,
)


def sw_oracle(q: str, t: str) -> float:
    """Sequential affine-gap Smith-Waterman (textbook DP) as the oracle."""
    qi = [AA_INDEX[a] for a in q]
    ti = [AA_INDEX[a] for a in t]
    lq, lt = len(qi), len(ti)
    NEG = -1e9
    h = np.zeros((lq + 1, lt + 1))
    e = np.full((lq + 1, lt + 1), NEG)
    f = np.full((lq + 1, lt + 1), NEG)
    best = 0.0
    for i in range(1, lq + 1):
        for j in range(1, lt + 1):
            # BLAST convention: length-k gap costs GAP_OPEN + k*GAP_EXT
            e[i][j] = max(
                h[i][j - 1] - (GAP_OPEN + GAP_EXT), e[i][j - 1] - GAP_EXT
            )
            f[i][j] = max(
                h[i - 1][j] - (GAP_OPEN + GAP_EXT), f[i - 1][j] - GAP_EXT
            )
            h[i][j] = max(
                0.0,
                h[i - 1][j - 1] + BLOSUM62[qi[i - 1], ti[j - 1]],
                e[i][j],
                f[i][j],
            )
            best = max(best, h[i][j])
    return best


PAIRS = [
    ("HEAGAWGHEE", "PAWHEAE"),
    ("MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQ", "MKTAYIAKQRQISFVK"),
    ("ACDEFGHIKLMNPQRSTVWY", "ACDEFGHIKLMNPQRSTVWY"),
    ("AAAA", "TTTT"),
    ("MSHHWGYGKHNGPEHWHKDFPIAKGERQSPVDIDTHTAKYDPSLKPLSVSYDQATSLRILNNGHAFNVEFD", "MSHHW"),
    ("WWWW", "WAWAW"),
]


def test_sw_matches_sequential_oracle():
    qs = [p[0] for p in PAIRS]
    ts = [p[1] for p in PAIRS]
    lq = max(len(q) for q in qs)
    lt = max(len(t) for t in ts)
    q_codes = np.stack([encode_sequence(q, lq) for q in qs])
    t_codes = np.stack([encode_sequence(t, lt) for t in ts])
    got = np.asarray(sw_scores(q_codes, t_codes))
    want = np.asarray([sw_oracle(q, t) for q, t in PAIRS])
    np.testing.assert_allclose(got, want)


def test_identity_alignment_score():
    seq = "ACDEFGHIKLMNPQRSTVWY"
    expected = sum(BLOSUM62[AA_INDEX[a], AA_INDEX[a]] for a in seq)
    q = encode_sequence(seq, 32)[None]
    t = encode_sequence(seq, 32)[None]
    assert float(sw_scores(q, t)[0]) == expected


def test_align_pairs_and_evalues():
    qs = ["MKTAYIAKQRQISFVKSHF", "ACDEFGHIKLMNPQRSTVWY", "WWWW"]
    ts = ["MKTAYIAKQRQISFVKSHF", "ACDEFGHIKLMNPQRSTVWY"[::-1], "PPPP"]
    scores, evs = align_pairs(qs, ts)
    assert scores[0] > scores[1] > scores[2]
    # identical pair must have a (much) smaller E-value
    assert evs[0] < evs[1] <= evs[2] * 10
    # E-values are monotone decreasing in score for equal lengths
    ev = np.asarray(
        e_values(np.asarray([10.0, 50.0]), np.asarray([100.0, 100.0]), 1e6)
    )
    assert ev[0] > ev[1]


def test_padding_does_not_change_score():
    q, t = "HEAGAWGHEE", "PAWHEAE"
    s1 = sw_scores(encode_sequence(q, 16)[None], encode_sequence(t, 16)[None])
    s2 = sw_scores(encode_sequence(q, 128)[None], encode_sequence(t, 64)[None])
    assert float(s1[0]) == float(s2[0])


def test_nested_scan_chunk_identical_scores():
    """scan_chunk nests the row scan (outer scan over row chunks) purely
    to cut TPU compile latency; carry flow is identical, so scores must
    be BIT-identical at every convention."""
    rng = np.random.RandomState(5)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    qs = ["".join(rng.choice(list(aas), rng.randint(20, 120))) for _ in range(6)]
    ts = ["".join(rng.choice(list(aas), rng.randint(20, 120))) for _ in range(6)]
    # lq=256 so every chunk below actually nests (sw_scores only nests
    # when lq > chunk) — including the align_pairs default chunk of 128
    # at its production Lq=256 bucket
    q = np.stack([encode_sequence(s, 256) for s in qs])
    t = np.stack([encode_sequence(s, 128) for s in ts])
    for convention in ("blast", "mmseqs"):
        base = np.asarray(sw_scores(q, t, convention=convention))
        for chunk in (32, 64, 128):
            nested = np.asarray(
                sw_scores(q, t, convention=convention, scan_chunk=chunk)
            )
            np.testing.assert_array_equal(base, nested)


def test_grouped_kernel_bit_identical_to_pair_kernel():
    """sw_scores_grouped (profile-slice substitution) must produce
    BIT-identical scores to sw_scores (one-hot contraction substitution)
    — they share _dp_row, the sub values are the same exact small
    integers (bf16 profile planes hold BLOSUM entries exactly), and the
    DP is f32 on both paths."""
    from knn_for_homology_tpu.ops.align import sw_scores_grouped

    rng = np.random.RandomState(7)
    aas = "ACDEFGHIKLMNPQRSTVWYX"
    g_n, k_n = 3, 5
    qs = ["".join(rng.choice(list(aas), rng.randint(10, 60)))
          for _ in range(g_n)]
    ts = [["".join(rng.choice(list(aas), rng.randint(10, 90)))
           for _ in range(k_n)] for _ in range(g_n)]
    lq, lt = 64, 96
    q_codes = np.stack([encode_sequence(q, lq) for q in qs])
    t_codes = np.stack(
        [np.stack([encode_sequence(t, lt) for t in row]) for row in ts]
    )
    for convention in ("blast", "mmseqs"):
        got = np.asarray(
            sw_scores_grouped(q_codes, t_codes, convention=convention)
        )
        flat_q = np.repeat(q_codes, k_n, axis=0)
        flat_t = t_codes.reshape(-1, lt)
        want = np.asarray(
            sw_scores(flat_q, flat_t, convention=convention)
        ).reshape(g_n, k_n)
        np.testing.assert_array_equal(got, want)
        # nested row scan: identical carry flow, bit-identical scores
        nested = np.asarray(sw_scores_grouped(
            q_codes, t_codes, convention=convention, scan_chunk=32
        ))
        np.testing.assert_array_equal(nested, want)


def test_grouped_kernel_matches_sequential_oracle():
    from knn_for_homology_tpu.ops.align import sw_scores_grouped

    qs = [p[0] for p in PAIRS[:3]]
    ts = [p[1] for p in PAIRS[:3]]
    lq = max(len(q) for q in qs)
    lt = max(len(t) for t in ts)
    # one group per pair, K=1
    q_codes = np.stack([encode_sequence(q, lq) for q in qs])
    t_codes = np.stack([encode_sequence(t, lt)[None] for t in ts])
    got = np.asarray(sw_scores_grouped(q_codes, t_codes))[:, 0]
    want = np.asarray([sw_oracle(q, t) for q, t in zip(qs, ts)])
    np.testing.assert_allclose(got, want)


def test_align_hits_matches_align_pairs():
    """align_hits (query-grouped, length-sorted row packing) must equal
    align_pairs (flat pair batches) pair-for-pair: same DP, same
    Karlin-Altschul epilogue — only the packing differs."""
    from knn_for_homology_tpu.ops.align import align_hits

    rng = np.random.RandomState(11)
    aas = "ACDEFGHIKLMNPQRSTVWY"

    def seq(lo, hi):
        return "".join(rng.choice(list(aas), rng.randint(lo, hi)))

    queries = [seq(20, 150) for _ in range(5)]
    hits = [
        [seq(15, 220) for _ in range(int(c))]
        for c in rng.randint(0, 10, size=5)
    ]
    db_res = float(sum(len(t) for row in hits for t in row))
    got_s, got_e = align_hits(
        queries, hits, db_residues=db_res, k_lanes=4, g_block=2, bucket=64
    )
    flat_q = [queries[i] for i, row in enumerate(hits) for _ in row]
    flat_t = [t for row in hits for t in row]
    want_s, want_e = align_pairs(flat_q, flat_t, db_residues=db_res,
                                 bucket=64)
    pos = 0
    for i, row in enumerate(hits):
        np.testing.assert_array_equal(
            got_s[i], want_s[pos : pos + len(row)]
        )
        np.testing.assert_allclose(
            got_e[i], want_e[pos : pos + len(row)], rtol=1e-6
        )
        pos += len(row)


def test_align_hits_ragged_packing_matches_align_pairs():
    """A hit mix that triggers RAGGED lane packing (one query with many
    short mixed-length hits at k_lanes=128) must still equal align_pairs
    pair-for-pair — the segmented kernel and the scatter indices undo the
    shared-lane packing exactly."""
    from knn_for_homology_tpu.ops.align import align_hits

    rng = np.random.RandomState(13)
    aas = "ACDEFGHIKLMNPQRSTVWY"

    def seq(lo, hi):
        return "".join(rng.choice(list(aas), rng.randint(lo, hi)))

    # query 0: 200 short hits (ragged-packed: classic pays 2 chunks);
    # query 1: a handful of hits longer than the query (flip-grouped)
    queries = [seq(100, 140), seq(30, 40)]
    hits = [
        [seq(8, 60) for _ in range(200)],
        [seq(50, 120) for _ in range(6)],
    ]
    db_res = float(sum(len(t) for row in hits for t in row))
    got_s, got_e = align_hits(
        queries, hits, db_residues=db_res, k_lanes=128, bucket=64
    )
    flat_q = [queries[i] for i, row in enumerate(hits) for _ in row]
    flat_t = [t for row in hits for t in row]
    want_s, want_e = align_pairs(
        flat_q, flat_t, db_residues=db_res, bucket=64
    )
    pos = 0
    for i, row in enumerate(hits):
        np.testing.assert_array_equal(
            got_s[i], want_s[pos : pos + len(row)]
        )
        np.testing.assert_allclose(
            got_e[i], want_e[pos : pos + len(row)], rtol=1e-6
        )
        pos += len(row)


def test_ragged_tail_blocks_stay_pallas_eligible():
    """The pow2 rounding of a TAIL dispatch chunk must never push
    g_pad past the SMEM budget that makes ragged cells Pallas-eligible
    (g_pad*lq_b <= 2^17): at lq_b=1920 the full chunk is g_max=68, and a
    67-row tail used to round to g_pad=128 -> 245k > 2^17, which the
    dispatcher then asserted on (ragged cells have no lax fallback)."""
    from knn_for_homology_tpu.ops.align import (
        iter_align_blocks,
        plan_align_cells,
    )
    from knn_for_homology_tpu.ops.align_pallas import MAX_LT_K_HBM

    class _Seq:
        __slots__ = ("n",)

        def __init__(self, n):
            self.n = int(n)

        def __len__(self):
            return self.n

    rng = np.random.RandomState(7)
    k_lanes = 128
    # one long row-side group (lq_b=1920) with enough mixed-length hits
    # to ragged-pack into >g_max rows plus a non-pow2-friendly tail
    q = _Seq(1900)
    hits_row = [_Seq(n) for n in rng.randint(20, 300, 135 * k_lanes)]
    cells = plan_align_cells([q], [hits_row], k_lanes, 128, 128)
    saw_ragged_tail = False
    for lq_b, lt_b, s_b, _sweep, g_pad, block in iter_align_blocks(cells):
        if s_b > 1:
            assert g_pad * lq_b <= 1 << 17, (g_pad, lq_b)
            assert lt_b * k_lanes <= MAX_LT_K_HBM
            if len(block) < g_pad or g_pad < 128:
                saw_ragged_tail = True
    assert saw_ragged_tail, "fixture no longer produces a ragged tail"
